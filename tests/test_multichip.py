"""Multi-chip sharding paths on the virtual 8-device CPU mesh."""

import numpy as np

import jax


def test_two_site_step_on_mesh():
    from tci_tpu.parallel.mesh import default_mesh
    from tci_tpu.parallel.step import two_site_step

    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    mesh = default_mesh(8)
    npivot, maxsample, values = two_site_step(mesh)
    assert npivot >= 1
    assert maxsample > 0
    assert np.all(np.isfinite(values))


def test_sharded_jax_evaluator():
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator
    from tci_tpu.parallel.mesh import default_mesh
    import jax.numpy as jnp

    mesh = default_mesh(8)

    def fjax(idx):
        v = idx.astype(jnp.float64) + 1.0
        return 1.0 / (1.0 + jnp.sum(v * v))

    localdims = [4] * 6
    bf = JaxBatchEvaluator(fjax, localdims, mesh=mesh)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4, size=(37, 6)).astype(np.int32)
    vals = bf.evaluate_many(idx)
    ref = np.array([1.0 / (1.0 + ((r + 1.0) ** 2).sum()) for r in idx.astype(float)])
    assert np.allclose(vals, ref)


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256,)
    g.dryrun_multichip(8)
