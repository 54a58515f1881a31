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
