"""Lifted structure loss vs a numpy transcription of the reference
(bcnn_lifted_structure_loss.c:16-319)."""

import jax
import jax.numpy as jnp
import numpy as np

from bcnn_tpu.ops.lifted_struct import lifted_struct_surrogate


def reference_lifted(x, labels_onehot, scale):
    """Direct transcription: returns (loss, grad) with grad already scaled
    by scale/num_constraints like the reference backward."""
    b, k = x.shape
    dot = -2.0 * x @ x.T
    sq = (x * x).sum(1)
    dot += sq[:, None] + sq[None, :]
    cls = np.argmax(labels_onehot > 0, axis=1)
    same = cls[:, None] == cls[None, :]
    margin = 1.0
    loss = 0.0
    grad = np.zeros_like(x)
    P = 0
    for i in range(b):
        for j in range(i + 1, b):
            if not same[i, j]:
                continue
            dist_pos = np.sqrt(dot[i, j])
            negs = []
            pairs = []
            for k2 in range(b):
                if not same[i, k2]:
                    negs.append(margin - np.sqrt(dot[i, k2]))
                    pairs.append(("i", k2))
            for k2 in range(b):
                if not same[j, k2]:
                    negs.append(margin - np.sqrt(dot[j, k2]))
                    pairs.append(("j", k2))
            negs = np.array(negs)
            m = max(0.0, negs.max())
            ex = np.exp(negs - m)
            sum_exp = ex.sum()
            soft_max = np.log(sum_exp) + m
            this_loss = max(0.0, soft_max + dist_pos)
            loss += this_loss**2
            P += 1
            scaler = 2.0 * this_loss / (dist_pos + 1e-10)
            grad[i] += scaler * (x[i] - x[j])
            grad[j] -= scaler * (x[i] - x[j])
            for idx, (anchor, k2) in enumerate(pairs):
                a = i if anchor == "i" else j
                dj = 2.0 * this_loss * -1.0 * ex[idx] / sum_exp
                s = dj / np.sqrt(dot[a, k2])
                grad[a] += s * (x[a] - x[k2])
                grad[k2] -= s * (x[a] - x[k2])
    return loss / P, grad * (scale / P)


def test_lifted_struct_loss_and_grad_match_reference():
    rng = np.random.RandomState(0)
    b, k = 8, 6
    x = rng.randn(b, k).astype(np.float32)
    labels = rng.randint(0, 3, b)
    onehot = np.zeros((b, 4), np.float32)
    onehot[np.arange(b), labels] = 1.0
    scale = 1.0

    ref_loss, ref_grad = reference_lifted(
        x.astype(np.float64), onehot, scale
    )
    sur = lifted_struct_surrogate(jnp.asarray(x), jnp.asarray(onehot), scale)
    np.testing.assert_allclose(float(sur), scale * ref_loss, rtol=1e-4)
    g = jax.grad(
        lambda x: lifted_struct_surrogate(x, jnp.asarray(onehot), scale)
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), ref_grad, rtol=1e-3, atol=1e-5)


def test_lifted_struct_in_cost_layer():
    from bcnn_tpu import (
        Activation, FillerType, Loss, Metric, Mode, Net, Session,
    )

    net = Net(Mode.TRAIN)
    net.set_input_shape(8, 8, 1, 8)
    net.set_sgd_optimizer(0.01, 0.9)
    net.add_fullc_layer(6, FillerType.XAVIER, Activation.NONE, 0, "input", "emb")
    net.add_cost_layer(Loss.LIFTED_STRUCT, Metric.SSE, 1.0, "emb")
    # cost layer reshapes label to src shape (n,6,1,1); the loader would
    # normally produce one-hots of that width
    sess = Session(net, 0).compile_net()
    rng = np.random.RandomState(1)
    x = rng.randn(8, 1, 8, 8).astype(np.float32)
    y = np.zeros((8, 6, 1, 1), np.float32)
    y[np.arange(8), rng.randint(0, 3, 8)] = 1.0
    l0 = None
    for i in range(10):
        loss = float(sess.train_on_batch(x, y))
        if l0 is None:
            l0 = loss
    assert np.isfinite(loss)
