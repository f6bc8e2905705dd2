"""Utility-layer tests: datasets, checkpoint registry, chain-state
checkpointing, profiling helpers, LPIPS architecture."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FFHQ = "/root/reference/exp/datasets/ffhq/samples_1k"


def test_folder_dataset():
    from nshmc_tpu.utils.datasets import FolderDataset, iterate

    ds = FolderDataset(FFHQ, image_size=32)
    assert len(ds) == 100
    img = ds[0]
    assert img.shape == (32, 32, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0

    items = list(iterate(ds, 0, 3))
    assert len(items) == 3
    # seeded shuffle is deterministic
    a = [i for i, _ in iterate(ds, 0, 5, shuffle_seed=7)]
    b = [i for i, _ in iterate(ds, 0, 5, shuffle_seed=7)]
    assert a == b


def test_npy_dataset(tmp_path):
    from nshmc_tpu.utils.datasets import NpyDataset

    arr = (np.random.default_rng(0).uniform(0, 255, (4, 3, 8, 8))).astype(np.uint8)
    p = tmp_path / "x.npy"
    np.save(p, arr)
    ds = NpyDataset(str(p))
    assert len(ds) == 4
    assert ds[0].shape == (8, 8, 3)
    assert ds[0].max() <= 1.0


def test_ckpt_registry():
    from nshmc_tpu.utils.ckpt_util import URL_MAP, MD5_MAP, get_ckpt_path, md5_hash

    assert "celeba_hq" in URL_MAP
    assert set(MD5_MAP) <= set(URL_MAP) | set(MD5_MAP)
    with pytest.raises(KeyError):
        get_ckpt_path("nope")
    # download attempt must fail loudly in the zero-egress environment
    with pytest.raises(RuntimeError, match="egress"):
        get_ckpt_path("cifar10", root="/tmp/_ckpt_test")


def test_chain_state_roundtrip(tmp_path):
    from nshmc_tpu.hmc.engine import HMCConfig, init_chain_state
    from nshmc_tpu.utils.checkpointing import save_chain_state, load_chain_state

    cfg = HMCConfig(sigma_0=0.1, sampling=2)
    state = init_chain_state(jax.random.PRNGKey(0), cfg, (4, 4, 1))
    save_chain_state(str(tmp_path / "ck"), state, step=3)
    restored = load_chain_state(str(tmp_path / "ck"), state, step=3)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profiling_helpers():
    from nshmc_tpu.utils.profiling import Timer, compiled_flops, named, scope

    t = Timer()
    x = jnp.ones((8, 8))
    with t.time("matmul", sync=None):
        y = x @ x
    assert "matmul" in t.summary()

    flops = compiled_flops(lambda a: a @ a, x)
    assert flops is None or flops > 0

    with named("region"):
        pass
    with scope("scope"):
        _ = x + 1


def test_enable_persistent_cache(tmp_path):
    from nshmc_tpu.utils.profiling import enable_persistent_cache

    # tmp_path is deleted after the test: restore the process-global jax
    # config afterwards so later tests don't run with a dangling cache dir.
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_min_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        path = enable_persistent_cache(str(tmp_path / "xla_cache"))
        assert path == str(tmp_path / "xla_cache")
        import os

        assert os.path.isdir(path)
        # jitting still works with the cache configured
        assert float(jax.jit(lambda a: a.sum())(jnp.ones(4))) == 4.0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min_time)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_min_size)


def test_lpips_architecture():
    from nshmc_tpu.utils.lpips import LPIPS

    model = LPIPS()
    a = jnp.zeros((1, 32, 32, 3))
    b = jnp.ones((1, 32, 32, 3)) * 0.5
    params = model.init(jax.random.PRNGKey(0), a, b)
    d_ab = model.apply(params, a, b)
    d_aa = model.apply(params, a, a)
    assert d_ab.shape == (1,)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-6)
    assert float(d_ab[0]) != 0.0


def test_nonlinear_blur_operator():
    from nshmc_tpu.operators import NonlinearBlur

    op = NonlinearBlur(channels=3, img_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3 * 16 * 16))
    y = op.H(x)
    assert y.shape == x.shape
    assert np.abs(np.asarray(y)).max() <= 1.0
    assert not op.is_linear()
    np.testing.assert_array_equal(np.asarray(op.H_pinv(y)), np.asarray(y))
    # differentiable through the blur net
    g = jax.grad(lambda x: jnp.sum(op.H(x) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_prefetch_iterator():
    from nshmc_tpu.utils.datasets import prefetch

    out = list(prefetch(iter(range(10)), depth=3))
    assert out == list(range(10))
