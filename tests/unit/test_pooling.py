import jax.numpy as jnp
import numpy as np

from sparse_rcnn_tpu.ops import coords as C
from sparse_rcnn_tpu.ops import pooling as P
from sparse_rcnn_tpu.ops import rulebook as R


def make(rng, n=120, cin=4, cap=256):
    c = np.unique(rng.integers(-6, 6, (n, 3)).astype(np.int32), axis=0)
    order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    c = c[order]
    f = rng.normal(size=(len(c), cin)).astype(np.float32)
    padded = np.full((cap, 3), C.COORD_OFFSET - 1, np.int32)
    padded[: len(c)] = c
    fp = np.zeros((cap, cin), np.float32)
    fp[: len(c)] = f
    return c, f, padded, fp


def test_max_and_avg_pool_vs_bruteforce(rng):
    c, f, cpad, fpad = make(rng)
    n, cap = len(c), 256
    oc, n_out, _ = R.downsample_sites(jnp.asarray(cpad), jnp.int32(n), 2, cap)
    idx = R.strided_rulebook(jnp.asarray(cpad), jnp.int32(n), oc, n_out, 2)
    mx = np.asarray(P.max_pool(jnp.asarray(fpad)[None], idx[None]))[0]
    av = np.asarray(P.avg_pool(jnp.asarray(fpad)[None], idx[None]))[0]
    oc_np, n_out = np.asarray(oc), int(n_out)
    for o in range(n_out):
        members = np.all(c // 2 == oc_np[o], axis=1)
        np.testing.assert_allclose(mx[o], f[members].max(0), rtol=1e-6)
        np.testing.assert_allclose(av[o], f[members].mean(0), rtol=1e-5)
    assert (mx[n_out:] == 0).all()


def test_global_pool(rng):
    c, f, cpad, fpad = make(rng)
    n = len(c)
    mean = np.asarray(P.global_pool(jnp.asarray(fpad)[None], jnp.asarray([n])))[0]
    np.testing.assert_allclose(mean, f.mean(0), rtol=1e-5)
    mx = np.asarray(P.global_pool(jnp.asarray(fpad)[None], jnp.asarray([n]), "max"))[0]
    np.testing.assert_allclose(mx, f.max(0), rtol=1e-6)
