/* Parity harness: drives the REFERENCE bcnn library (built from
 * /root/reference with its own CMake) so the test suite can compare this
 * framework's outputs against the original implementation numerically.
 *
 * Usage:
 *   ref_harness forward <conf> <weights> <input.raw> <tensor> <out.raw>
 *       load net in PREDICT mode, copy the float32 input blob into the
 *       input tensor, run bcnn_forward, dump the named tensor.
 *   ref_harness detect <conf> <weights> <input.raw> <out.raw> <thresh>
 *       same, then bcnn_yolo_get_detections (img dims == net dims, so the
 *       letterbox correction is identity) and dump detections as rows of
 *       [x y w h objectness prob...].
 *   ref_harness resave <conf> <weights> <out.bcnnmodel> <unused>
 *       load then bcnn_save_weights — produces a REFERENCE-written model
 *       file for testing the other direction of format compatibility.
 *
 * This file is ours (it only *calls* the reference's public API).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <bcnn/bcnn.h>

static float *read_blob(const char *path, long *n) {
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    float *buf = (float *)malloc(bytes);
    if (fread(buf, 1, bytes, f) != (size_t)bytes) exit(2);
    fclose(f);
    *n = bytes / (long)sizeof(float);
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 6) {
        fprintf(stderr, "usage: %s forward|detect <conf> <weights> "
                        "<input.raw> ...\n", argv[0]);
        return 1;
    }
    const char *mode = argv[1];
    bcnn_net *net = NULL;
    /* resave must avoid the PREDICT-mode BN fold-at-load, else the written
     * file holds folded scales over raw stats and double-folds on reload */
    bcnn_init_net(&net, strcmp(mode, "resave") == 0 ? BCNN_MODE_TRAIN
                                                    : BCNN_MODE_PREDICT);
    if (bcnn_load_net(net, argv[2], argv[3]) != BCNN_SUCCESS) {
        fprintf(stderr, "load_net failed\n");
        return 3;
    }
    if (bcnn_compile_net(net) != BCNN_SUCCESS) {
        fprintf(stderr, "compile_net failed\n");
        return 3;
    }
    if (strcmp(mode, "resave") == 0) {
        if (bcnn_save_weights(net, argv[4]) != BCNN_SUCCESS) {
            fprintf(stderr, "save_weights failed\n");
            return 5;
        }
        fprintf(stderr, "resaved to %s\n", argv[4]);
        return 0;
    }
    long n_in = 0;
    float *input = read_blob(argv[4], &n_in);
    bcnn_tensor *t_in = bcnn_get_tensor_by_name(net, "input");
    memcpy(t_in->data, input, n_in * sizeof(float));

    bcnn_forward(net);

    if (strcmp(mode, "forward") == 0) {
        bcnn_tensor *t = bcnn_get_tensor_by_name(net, argv[5]);
        if (!t || !t->data) { fprintf(stderr, "no tensor %s\n", argv[5]); return 4; }
        long sz = (long)t->n * t->c * t->h * t->w;
        FILE *f = fopen(argv[6], "wb");
        fwrite(t->data, sizeof(float), sz, f);
        fclose(f);
        fprintf(stderr, "dumped %s: %ld floats (%d,%d,%d,%d)\n",
                argv[5], sz, t->n, t->c, t->h, t->w);
    } else if (strcmp(mode, "detect") == 0) {
        bcnn_tensor *t0 = bcnn_get_tensor_by_name(net, "input");
        float thresh = (float)atof(argv[6]);
        int num_dets = 0;
        bcnn_output_detection *dets = bcnn_yolo_get_detections(
            net, 0, t0->w, t0->h, t0->w, t0->h, thresh, 1, &num_dets);
        FILE *f = fopen(argv[5], "wb");
        /* rows: x y w h objectness prob[0..C-1] */
        for (int i = 0; i < num_dets; ++i) {
            fwrite(&dets[i].x, sizeof(float), 1, f);
            fwrite(&dets[i].y, sizeof(float), 1, f);
            fwrite(&dets[i].w, sizeof(float), 1, f);
            fwrite(&dets[i].h, sizeof(float), 1, f);
            fwrite(&dets[i].objectness, sizeof(float), 1, f);
            fwrite(dets[i].prob, sizeof(float), dets[i].num_classes, f);
        }
        fclose(f);
        fprintf(stderr, "dumped %d detections\n", num_dets);
    }
    free(input);
    return 0;
}
