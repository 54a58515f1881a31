"""Async host->device feed (data/pipeline.py): the double-buffered
prefetch and the W-worker sharded pipeline that parallelizes host decode
while PRESERVING the sequential stream's batch order (the same stripe
partition the multi-host recipe uses across processes — set_shard —
applied across threads)."""

import numpy as np

from bcnn_tpu import Mode, Net
from bcnn_tpu import bip
from bcnn_tpu.data import (
    BatchPipeline,
    ClassificationListLoader,
    ShardedBatchPipeline,
)


def make_net(w, h, c, batch, classes):
    net = Net(Mode.TRAIN)
    net.set_input_shape(w, h, c, batch)
    t1 = net.tensors[1]
    t1.c, t1.h, t1.w = classes, 1, 1
    return net


def write_dataset(tmp_path, n=36, hw=12, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        img = (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
        img[0, 0, 0] = i  # per-sample fingerprint survives normalization
        p = tmp_path / f"im{i}.png"
        bip.write_image(str(p), img)
        lines.append(f"{p} {i % classes}")
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return lst


def sequential_batches(tmp_path, lst, batch, classes, k):
    net = make_net(12, 12, 3, batch, classes)
    loader = ClassificationListLoader(net, str(lst))
    out = [loader.next_batch() for _ in range(k)]
    loader.close()
    return out


def test_batch_pipeline_matches_sequential(tmp_path):
    lst = write_dataset(tmp_path)
    batch, classes, k = 6, 4, 4
    want = sequential_batches(tmp_path, lst, batch, classes, k)

    net = make_net(12, 12, 3, batch, classes)
    pipe = BatchPipeline(ClassificationListLoader(net, str(lst)), depth=2)
    it = iter(pipe)
    for i in range(k):
        x, y = next(it)
        np.testing.assert_array_equal(np.asarray(x), want[i][0], err_msg=str(i))
        np.testing.assert_array_equal(np.asarray(y), want[i][1])
    pipe.stop()


def test_sharded_pipeline_preserves_sequential_batch_order(tmp_path):
    """W workers with (w, W)-striped loaders, consumed round-robin, must
    reproduce EXACTLY the 1-stream batch sequence (augmentation off; with
    augmentation only the RNG streams differ, not order/labels)."""
    lst = write_dataset(tmp_path)
    batch, classes, k = 6, 4, 6  # 36 samples = one full epoch per window
    want = sequential_batches(tmp_path, lst, batch, classes, k)

    for workers in (2, 3):
        net = make_net(12, 12, 3, batch, classes)
        pipe = ShardedBatchPipeline(
            lambda: ClassificationListLoader(net, str(lst)),
            workers=workers, depth=2,
        ).start()
        it = iter(pipe)
        for i in range(k):
            x, y = next(it)
            np.testing.assert_array_equal(
                np.asarray(x), want[i][0],
                err_msg=f"workers={workers} batch={i}",
            )
            np.testing.assert_array_equal(np.asarray(y), want[i][1])
        pipe.stop()


def test_sharded_pipeline_rewinds_past_eof(tmp_path):
    """Each shard auto-rewinds at EOF like the sequential stream: reading
    past one epoch keeps producing batches (per-shard rewind semantics)."""
    lst = write_dataset(tmp_path, n=24)
    batch, classes = 6, 4
    net = make_net(12, 12, 3, batch, classes)
    pipe = ShardedBatchPipeline(
        lambda: ClassificationListLoader(net, str(lst)),
        workers=2, depth=1,
    ).start()
    it = iter(pipe)
    got = [next(it) for _ in range(10)]  # 60 samples > 24-sample epoch
    assert all(np.asarray(x).shape == (batch, 3, 12, 12) for x, _ in got)
    pipe.stop()


def test_batch_pipeline_surfaces_loader_errors(tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("/does/not/exist.png 0\n")
    net = make_net(12, 12, 3, 2, 4)

    class Boom(ClassificationListLoader):
        def next_batch(self):
            raise RuntimeError("loader exploded")

    pipe = BatchPipeline(Boom(net, str(lst)), depth=1)
    it = iter(pipe)
    try:
        next(it)
        raise AssertionError("expected the loader error to propagate")
    except RuntimeError as e:
        assert "exploded" in str(e)
    pipe.stop()


def test_raw_records_roundtrip_and_shard(tmp_path):
    """records.py: decode-once record files — write from a loader's
    VALID path, read back exactly; set_shard striping matches the
    in-memory partition; training from records + on-device augment
    equals training from loader pixels (identity augment)."""
    from bcnn_tpu.data import (
        RawRecordLoader,
        records_from_loader,
    )

    lst = write_dataset(tmp_path, n=12)
    batch, classes = 4, 4
    net = make_net(12, 12, 3, batch, classes)
    rec = tmp_path / "train.bcrd"
    n = records_from_loader(
        ClassificationListLoader(net, str(lst)), str(rec), 12
    )
    assert n == 12

    # roundtrip: loader VALID floats == (records - 127.5)/127.5
    net2 = make_net(12, 12, 3, batch, classes)
    src = ClassificationListLoader(net2, str(lst))
    src.set_mode(Mode.VALID)
    rl = RawRecordLoader(net2, str(rec))
    for _ in range(3):
        xf, yf = src.next_batch()
        xu, yu = rl.next_batch()
        assert xu.dtype == np.uint8
        np.testing.assert_allclose(
            (xu.astype(np.float32) - 127.5) / 127.5, xf, atol=1e-6
        )
        np.testing.assert_array_equal(yu, yf)
    src.close()

    # striping: 2 shards' round-robin == the sequential record order
    seq = RawRecordLoader(net2, str(rec))
    shards = []
    for w in range(2):
        s = RawRecordLoader(net2, str(rec))
        s.set_shard(w, 2)
        shards.append(s)
    for _ in range(3):
        for s in shards:
            xs, ys = s.next_batch()
            xq, yq = seq.next_batch()
            np.testing.assert_array_equal(xs, xq)
            np.testing.assert_array_equal(ys, yq)


def test_train_step_from_records_with_device_augment(tmp_path):
    """The advertised loop: uint8 records in, device-side normalization
    (identity augment config) — loss equals the float-loader step."""
    import jax
    import jax.numpy as jnp

    from bcnn_tpu import (
        Activation, FillerType, Loss, Metric, Session,
    )
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.data import RawRecordLoader, records_from_loader

    lst = write_dataset(tmp_path, n=8)

    def build():
        net = Net(Mode.TRAIN)
        net.set_input_shape(12, 12, 3, 4)
        net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
        net.add_convolutional_layer(
            8, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0,
            "input", "c1",
        )
        net.add_fullc_layer(
            4, FillerType.XAVIER, Activation.NONE, 0, "c1", "f"
        )
        net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "f")
        return net

    net = build()
    rec = tmp_path / "t.bcrd"
    records_from_loader(ClassificationListLoader(net, str(lst)),
                        str(rec), 8)
    rl = RawRecordLoader(net, str(rec))
    xu, yu = rl.next_batch()

    sess = Session(net, seed=0).compile_net()
    key = jax.random.PRNGKey(0)

    # float path
    step_f = make_train_step(net)
    xf = jnp.asarray((xu.astype(np.float32) - 127.5) / 127.5)
    _, _, _, loss_f = step_f(
        sess.params, sess.state, sess.opt_state,
        {"input": xf, "label": jnp.asarray(yu)}, key,
    )

    # uint8 + device augment path (identity config: no random ops on)
    net_u = build()
    sess_u = Session(net_u, seed=0).compile_net()
    step_u = make_train_step(net_u, device_augment={})
    _, _, _, loss_u = step_u(
        sess_u.params, sess_u.state, sess_u.opt_state,
        {"input": jnp.asarray(xu), "label": jnp.asarray(yu)}, key,
    )
    np.testing.assert_allclose(
        float(loss_f), float(loss_u), rtol=1e-5
    )


def test_train_scan_from_records_with_device_augment(tmp_path):
    """The production loop shape: uint8 record batches staged (K, B, ...)
    into ONE scan program with device-side normalization (identity
    augment config) — per-step losses equal the float-staged scan."""
    import jax
    import jax.numpy as jnp

    from bcnn_tpu import (
        Activation, FillerType, Loss, Metric, Session,
    )
    from bcnn_tpu.compile import make_train_scan
    from bcnn_tpu.data import RawRecordLoader, records_from_loader

    lst = write_dataset(tmp_path, n=8)

    def build():
        net = Net(Mode.TRAIN)
        net.set_input_shape(12, 12, 3, 4)
        net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
        net.add_convolutional_layer(
            8, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0,
            "input", "c1",
        )
        net.add_fullc_layer(
            4, FillerType.XAVIER, Activation.NONE, 0, "c1", "f"
        )
        net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "f")
        return net

    net = build()
    rec = tmp_path / "t.bcrd"
    records_from_loader(ClassificationListLoader(net, str(lst)),
                        str(rec), 8)
    rl = RawRecordLoader(net, str(rec))
    k = 2
    batches = [rl.next_batch() for _ in range(k)]
    xu = np.stack([b[0] for b in batches])  # (K, B, C, H, W) uint8
    yu = np.stack([b[1] for b in batches]).astype(np.float32)
    assert xu.dtype == np.uint8
    key = jax.random.PRNGKey(0)

    # float-staged scan
    sess = Session(net, seed=0).compile_net()
    scan_f = make_train_scan(net)
    xf = jnp.asarray((xu.astype(np.float32) - 127.5) / 127.5)
    _, _, _, losses_f = scan_f(
        sess.params, sess.state, sess.opt_state,
        {"input": xf, "label": jnp.asarray(yu)}, key,
    )

    # uint8-staged scan + device augment (identity config)
    net_u = build()
    sess_u = Session(net_u, seed=0).compile_net()
    scan_u = make_train_scan(net_u, device_augment={})
    _, _, _, losses_u = scan_u(
        sess_u.params, sess_u.state, sess_u.opt_state,
        {"input": jnp.asarray(xu), "label": jnp.asarray(yu)}, key,
    )
    np.testing.assert_allclose(
        np.asarray(losses_f), np.asarray(losses_u), rtol=1e-5
    )

    # the Session surface accepts the combination (mesh path still
    # refuses): uint8 staging happens inside train_scan_on_batches
    net_s = build()
    net_s.device_augment = {}
    sess_s = Session(net_s, seed=0).compile_net()
    sess_s.loader = RawRecordLoader(net_s, str(rec))
    loss_sum = sess_s.train_scan_on_batches(k)
    assert np.isfinite(loss_sum)


def test_sharded_pipeline_decorrelates_augment_streams(tmp_path):
    """Workers start from factory-identical augmenter seeds; the pipeline
    must decorrelate them (else every stripe draws the SAME augmentation
    sequence). With brightness augmentation on, two workers' batches for
    the same window must differ somewhere in pixels while labels stay the
    stream's own."""
    lst = write_dataset(tmp_path, n=24)
    batch, classes = 6, 4

    def build_loader():
        net = make_net(12, 12, 3, batch, classes)
        ld = ClassificationListLoader(net, str(lst))
        ld.augmenter.min_brightness = -60
        ld.augmenter.max_brightness = 60
        return ld

    pipe = ShardedBatchPipeline(build_loader, workers=2, depth=1).start()
    it = iter(pipe)
    b0 = np.asarray(next(it)[0])
    b1 = np.asarray(next(it)[0])
    pipe.stop()

    # sequential single-stream reference with the SAME (seed-0) augmenter:
    # worker 0's stripe must match it draw-for-draw (the parity stream)...
    ref = build_loader()
    r0 = ref.next_batch()[0]
    r1 = ref.next_batch()[0]
    ref.close()
    np.testing.assert_array_equal(b0, r0)
    # ...while worker 1's stripe must NOT reproduce the seed-0 draws that
    # the sequential stream would apply to those samples
    assert not np.array_equal(b1, r1), (
        "worker 1 drew the same augmentation sequence as worker 0"
    )


def test_raw_records_native_gather_bit_identical(tmp_path, monkeypatch):
    """The native (C++/OpenMP) record gather must produce exactly the
    Python mmap path's batches, wrap-around included."""
    from bcnn_tpu.bip.native import get_lib
    from bcnn_tpu.data import RawRecordLoader, records_from_loader

    if get_lib() is None or not hasattr(
        get_lib(), "bcnn_loader_records_batch"
    ):
        import pytest

        pytest.skip("native library unavailable")

    lst = write_dataset(tmp_path, n=10)
    net = make_net(12, 12, 3, 4, 4)
    rec = tmp_path / "t.bcrd"
    records_from_loader(ClassificationListLoader(net, str(lst)),
                        str(rec), 10)

    ln = RawRecordLoader(net, str(rec))
    monkeypatch.setenv("BCNN_TPU_NATIVE_LOADER", "0")
    lp = RawRecordLoader(net, str(rec))
    monkeypatch.delenv("BCNN_TPU_NATIVE_LOADER")
    import os
    for i in range(6):  # 24 samples over a 10-record file: wraps twice
        os.environ["BCNN_TPU_NATIVE_LOADER"] = "1"
        xn, yn = ln.next_batch()
        os.environ["BCNN_TPU_NATIVE_LOADER"] = "0"
        xp, yp = lp.next_batch()
        np.testing.assert_array_equal(xn, xp, err_msg=str(i))
        np.testing.assert_array_equal(yn, yp)
    del os.environ["BCNN_TPU_NATIVE_LOADER"]


def test_session_resident_scan_surface(tmp_path):
    """Session.train_scan_resident_on_batches: records decoded + uploaded
    once, K-step scans driven by index slabs; equals the staged
    train_scan_on_batches trajectory in sequential (shuffle=False) order;
    refuses non-record loaders and augment-less nets; runs under a DP
    mesh (dataset replicated, indices batch-sharded)."""
    import jax
    import pytest

    from bcnn_tpu import (
        Activation, FillerType, Loss, Metric, Session,
    )
    from bcnn_tpu.data import RawRecordLoader, records_from_loader

    lst = write_dataset(tmp_path, n=8)

    def build(aug=True):
        net = Net(Mode.TRAIN)
        net.set_input_shape(12, 12, 3, 4)
        net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
        net.add_convolutional_layer(
            8, 3, 1, 1, 1, 0, FillerType.XAVIER, Activation.RELU, 0,
            "input", "c1",
        )
        net.add_fullc_layer(
            4, FillerType.XAVIER, Activation.NONE, 0, "c1", "f"
        )
        net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "f")
        if aug:
            net.device_augment = {}
        return net

    rec = tmp_path / "t.bcrd"
    records_from_loader(
        ClassificationListLoader(build(aug=False), str(lst)), str(rec), 8
    )

    # staged scan vs resident scan, same sequential order + rng stream
    sess_a = Session(build(), seed=3).compile_net()
    sess_a.loader = RawRecordLoader(sess_a.net, str(rec))
    la = [sess_a.train_scan_on_batches(2) for _ in range(2)]

    sess_b = Session(build(), seed=3).compile_net()
    sess_b.loader = RawRecordLoader(sess_b.net, str(rec))
    lb = [sess_b.train_scan_resident_on_batches(2) for _ in range(2)]
    np.testing.assert_allclose(la, lb, rtol=1e-5)

    # refusals
    sess_c = Session(build(), seed=0).compile_net()
    sess_c.loader = ClassificationListLoader(sess_c.net, str(lst))
    with pytest.raises(ValueError, match="RawRecordLoader"):
        sess_c.train_scan_resident_on_batches(2)
    net_d = build(aug=False)
    sess_d = Session(net_d, seed=0).compile_net()
    sess_d.loader = RawRecordLoader(net_d, str(rec))
    with pytest.raises(ValueError, match="device_augment"):
        sess_d.train_scan_resident_on_batches(2)

    # DP mesh: runs and stays finite (bit-parity vs single device is
    # pinned at the factory level in test_parallel.py)
    from bcnn_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:4])
    sess_m = Session(build(), seed=3, mesh=mesh).compile_net()
    sess_m.loader = RawRecordLoader(sess_m.net, str(rec))
    lm = sess_m.train_scan_resident_on_batches(2)
    assert np.isfinite(lm)
    np.testing.assert_allclose(lm, lb[0], rtol=1e-4)
