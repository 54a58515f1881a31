"""Video-mode detection loop (examples/yolo_example.py `video`): the
reference's OpenCV frame loop (yolo_example.cc:219-240) rebuilt as a
prefetch-pipelined stream over a directory of frames or a raw .y4m clip.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "examples")
)

from bcnn_tpu import Mode, Session
from bcnn_tpu.models import yolov3_tiny


def _write_y4m(path, frames):
    h, w = frames[0].shape[:2]
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode())
        for rgb in frames:
            # crude RGB -> BT.601 YUV420 (round trip only needs to be
            # approximate; the reader is what's under test)
            r = rgb[..., 0].astype(np.float32)
            g = rgb[..., 1].astype(np.float32)
            b = rgb[..., 2].astype(np.float32)
            y = 16 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
            u = 128 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
            v = 128 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
            f.write(b"FRAME\n")
            f.write(np.clip(y, 0, 255).astype(np.uint8).tobytes())
            f.write(
                np.clip(u[::2, ::2], 0, 255).astype(np.uint8).tobytes()
            )
            f.write(
                np.clip(v[::2, ::2], 0, 255).astype(np.uint8).tobytes()
            )


def test_y4m_reader_roundtrip(tmp_path):
    from yolo_example import read_y4m_frames

    # smooth frames: 4:2:0 chroma subsampling makes noise images lossy
    ys, xs = np.mgrid[0:32, 0:48].astype(np.float32)
    frames = [
        np.stack(
            [(xs * 5 + k * 20) % 256, (ys * 7) % 256,
             ((xs + ys) * 3) % 256],
            -1,
        ).astype(np.uint8)
        for k in range(3)
    ]
    p = str(tmp_path / "clip.y4m")
    _write_y4m(p, frames)
    got = list(read_y4m_frames(p))
    assert len(got) == 3
    for a, b in zip(got, frames):
        assert a.shape == b.shape and a.dtype == np.uint8
        # YUV420 roundtrip loses chroma resolution; luma must track
        assert (
            np.abs(
                a.mean(-1).astype(np.float32)
                - b.mean(-1).astype(np.float32)
            ).mean()
            < 16.0
        )


def test_video_loop_y4m(tmp_path):
    from yolo_example import run_video

    rng = np.random.RandomState(1)
    frames = [
        (rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(4)
    ]
    clip = str(tmp_path / "clip.y4m")
    _write_y4m(clip, frames)

    net = yolov3_tiny(batch_size=1, width=64, height=64, classes=4,
                      mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    out = str(tmp_path / "dets")
    n, fps = run_video(clip, net, sess, out, thresh=0.1)
    assert n == 4
    written = sorted(os.listdir(out))
    assert written == [f"frame_{i:05d}.png" for i in range(4)]


def test_video_loop_frame_dir(tmp_path):
    from bcnn_tpu import bip
    from yolo_example import run_video

    rng = np.random.RandomState(2)
    src = tmp_path / "frames"
    src.mkdir()
    for i in range(3):
        bip.write_image(
            str(src / f"f{i}.png"),
            (rng.rand(40, 56, 3) * 255).astype(np.uint8),
        )
    net = yolov3_tiny(batch_size=1, width=64, height=64, classes=4,
                      mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    out = str(tmp_path / "dets")
    n, _ = run_video(str(src), net, sess, out)
    assert n == 3 and len(os.listdir(out)) == 3


def _write_avi(path, frames, fps=25):
    cv2 = __import__("cv2")
    h, w = frames[0].shape[:2]
    wr = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h)
    )
    assert wr.isOpened()
    for rgb in frames:
        wr.write(rgb[..., ::-1].copy())  # writer takes BGR
    wr.release()


def test_cv2_reader_roundtrip(tmp_path):
    """read_cv2_frames (the reference's open_video file path,
    yolo_example.cc:110-124) decodes an MJPG avi back to RGB frames."""
    import pytest

    pytest.importorskip("cv2")
    from yolo_example import read_cv2_frames

    ys, xs = np.mgrid[0:48, 0:64].astype(np.float32)
    frames = [
        np.stack(
            [(xs * 4 + k * 30) % 256, (ys * 5) % 256, ((xs + ys) * 2) % 256],
            -1,
        ).astype(np.uint8)
        for k in range(5)
    ]
    clip = str(tmp_path / "clip.avi")
    _write_avi(clip, frames)
    got = list(read_cv2_frames(clip))
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert a.shape == b.shape and a.dtype == np.uint8
        # MJPG is lossy; mean absolute error must stay small and the
        # channel order must be RGB (red gradient along x, not swapped)
        assert np.abs(
            a.astype(np.float32) - b.astype(np.float32)
        ).mean() < 12.0


def test_video_loop_cv2_capture(tmp_path):
    """The full video loop over a cv2 capture source — the executable
    equivalent of the reference's webcam/video branch."""
    import pytest

    pytest.importorskip("cv2")
    from yolo_example import run_video

    rng = np.random.RandomState(3)
    frames = [
        (rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(3)
    ]
    clip = str(tmp_path / "clip.avi")
    _write_avi(clip, frames)
    net = yolov3_tiny(batch_size=1, width=64, height=64, classes=4,
                      mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    out = str(tmp_path / "dets")
    n, _ = run_video(clip, net, sess, out, thresh=0.1)
    assert n == 3 and len(os.listdir(out)) == 3
