"""Self-contained multi-chip dry run: the REAL TCI2 optimization loop,
mesh-sharded, on a virtual n-device CPU mesh.

This is the rebuild's multi-chip validation path (SURVEY.md §2.5): the
full ``crossinterpolate2`` training step — device-resident two-site sweeps
with the Π-panel sampling sharded over the mesh's batch axis, rrLU pivot
selection, site-tensor extraction, global pivot search — compiles and
executes over an ``n_devices`` mesh, and the result is checked pointwise
against the integrand.

``run(n)`` forces the CPU platform *before* any backend initialization so
it never inherits a broken/tunneled accelerator platform from the caller's
environment; ``__graft_entry__.dryrun_multichip`` executes it in a fresh
subprocess with ``--xla_force_host_platform_device_count=n``.
"""

from __future__ import annotations


def run(n_devices: int) -> None:
    import jax

    # Must happen before the backend initializes. The env may pin an
    # experimental accelerator platform (e.g. a tunneled TPU via
    # sitecustomize); the dry run always validates sharding on host devices.
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import tci_tpu as tci
    from tci_tpu.parallel.batcheval import JaxBatchEvaluator
    from tci_tpu.parallel.mesh import default_mesh

    import jax.numpy as jnp

    cpus = jax.devices("cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"dryrun_multichip needs {n_devices} CPU devices but found "
            f"{len(cpus)}; XLA_FLAGS must contain "
            f"--xla_force_host_platform_device_count={n_devices} before "
            "jax initializes"
        )
    mesh = default_mesh(n_devices)

    # Flagship integrand (reference README.md:21-29 quickstart), small grid
    # so the dry run stays cheap: f(v) = 1/(1 + v·v) on {1..4}^6.
    localdims = [4] * 6

    def fjax(idx):
        v = idx.astype(jnp.float64) + 1.0
        return 1.0 / (1.0 + jnp.sum(v * v))

    bf = JaxBatchEvaluator(fjax, localdims, dtype=np.float64, mesh=mesh)
    tciobj, ranks, errors = tci.crossinterpolate2(
        np.float64, bf, localdims, tolerance=1e-8, maxiter=4
    )

    # pointwise spot check against the integrand
    pt = (1, 2, 3, 0, 2, 1)
    v = np.asarray(pt, dtype=float) + 1.0
    exact = 1.0 / (1.0 + v @ v)
    err = abs(tciobj(pt) - exact)
    assert np.isfinite(errors).all(), f"non-finite errors: {errors}"
    assert err < 1e-6, f"pointwise error {err} too large"
    assert tciobj.rank() >= 1

    # Tensor-parallel rrLU (SURVEY §2.5 "shard the Π matrix / rrLU panels
    # across devices"): the mesh-sharded elimination must be bit-identical
    # to the single-device kernel — pivot order, permutations, rank.
    from tci_tpu.ops.lu_kernel import rrlu_raw
    from tci_tpu.ops.lu_sharded import rrlu_sharded_raw

    rng = np.random.default_rng(0)
    panel = rng.standard_normal((96, 9)) @ rng.standard_normal((9, 64))
    s = rrlu_sharded_raw(panel, 32, 1e-10, 0.0, True, mesh=mesh)
    r = rrlu_raw(panel, 32, 1e-10, 0.0, True)
    assert s[3] == r[3], f"sharded rrLU rank {s[3]} != {r[3]}"
    assert np.array_equal(s[1], r[1]) and np.array_equal(s[2], r[2]), \
        "sharded rrLU pivot order diverged from the single-device kernel"
    assert np.allclose(s[0], r[0], atol=1e-12)

    # Mesh-sharded L5/L3 device tiers: contraction and whole-chain
    # compression run every bond split's elimination tensor-parallel over
    # the mesh and must be BIT-IDENTICAL to the single-device device tier.
    from tci_tpu.models.contraction import contract
    from tci_tpu.models.tensortrain import TensorTrain, fulltensor

    def _mpo(seed, L, chi, d1, d2):
        g = np.random.default_rng(seed)
        bonds = [1] + [chi] * (L - 1) + [1]
        return TensorTrain(
            [g.standard_normal((bonds[n], d1, d2, bonds[n + 1]))
             for n in range(L)]
        )

    A, B = _mpo(1, 4, 3, 2, 2), _mpo(2, 4, 3, 2, 2)
    c1 = contract(A, B, algorithm="zipup", method="LU", tolerance=1e-10,
                  jax_native=True)
    cm = contract(A, B, algorithm="zipup", method="LU", tolerance=1e-10,
                  jax_native=True, mesh=mesh)
    assert c1.linkdims() == cm.linkdims()
    for a, b in zip(c1.sitetensors(), cm.sitetensors()):
        assert np.array_equal(a, b), "mesh zip-up diverged bitwise"
    exact = fulltensor(contract(A, B, algorithm="naive"))
    assert np.allclose(fulltensor(cm), exact,
                       atol=1e-9 * np.abs(exact).max())

    tt1 = TensorTrain([t.copy() for t in c1.sitetensors()])
    ttm = TensorTrain([t.copy() for t in c1.sitetensors()])
    tt1.compress("LU", tolerance=1e-10, jax_native=True)
    ttm.compress("LU", tolerance=1e-10, jax_native=True, mesh=mesh)
    assert tt1.linkdims() == ttm.linkdims()
    for a, b in zip(tt1.sitetensors(), ttm.sitetensors()):
        assert np.array_equal(a, b), "mesh compression diverged bitwise"

    # Serving rook (the config-2 headline path): a deferred mixed-precision
    # fused factorization executed while the mesh is live. The program is
    # single-device BY DESIGN (one slab alternation fits one chip; scaling
    # is by factorizing independent panels in parallel, not by sharding one
    # panel — docs/ARCHITECTURE.md), so this checks it runs correctly on
    # the mesh's default device alongside mesh-sharded work and that the
    # deferred handle round-trips.
    from tci_tpu.ops.lu_device import rrlu_rook_device_fused

    srv_A = rng.standard_normal((128, 12)) @ rng.standard_normal((12, 96))
    pend = rrlu_rook_device_fused(
        srv_A, maxrank=24, reltol=1e-11, rng=np.random.default_rng(3),
        precision="mixed", defer=True,
    )
    srv = pend.result()
    srv_rel = float(
        np.abs(np.asarray(srv.left() @ srv.right()) - srv_A).max()
        / np.abs(srv_A).max()
    )
    assert srv.npivots() == 12, f"serving rook rank {srv.npivots()} != 12"
    assert srv_rel < 1e-9, f"serving rook recon {srv_rel}"

    # Mesh-sharded GK integration (integration.jl:68-161): the quadrature
    # over the mesh must match the single-device trajectory exactly.
    from tci_tpu.models.integration import integrate

    N = 3

    def poly(x):
        return jnp.prod(x)

    vi1 = integrate(np.float64, lambda x: poly(x), [0.0] * N, [1.0] * N,
                    GKorder=15, jax_native=True, tolerance=1e-10,
                    rng=np.random.default_rng(5))
    vim = integrate(np.float64, lambda x: poly(x), [0.0] * N, [1.0] * N,
                    GKorder=15, jax_native=True, mesh=mesh, tolerance=1e-10,
                    rng=np.random.default_rng(5))
    assert abs(vi1 - 0.5 ** N) < 1e-10, f"integrate off: {vi1}"
    assert abs(vim - vi1) < 1e-13, f"mesh integrate diverged: {vim} vs {vi1}"

    print(
        f"dryrun_multichip({n_devices}): ok — platform=cpu, "
        f"mesh={tuple(mesh.devices.shape)}, rank={tciobj.rank()}, "
        f"final_error={errors[-1]:.3e}, pointwise_err={err:.3e}, "
        f"nevals={bf.nevals}, tp_rrlu_rank={s[3]} (bit-parity ok), "
        f"mesh_contraction_linkdims={cm.linkdims()} (bitwise ok), "
        f"mesh_compress_linkdims={ttm.linkdims()} (bitwise ok), "
        f"serving_rook_rank={srv.npivots()} (deferred mixed, recon "
        f"{srv_rel:.1e}), "
        f"mesh_integration={vim:.12f} (single-device match ok)"
    )


if __name__ == "__main__":
    import sys

    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
