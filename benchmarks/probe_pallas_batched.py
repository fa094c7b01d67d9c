"""Bisect which construct of the batched (grid) rrLU Pallas kernel crashes
the Mosaic backend (tpu_compile_helper exit 1) on this TPU stack.

Round-3 found three such backend crashes (1-D reduce-sum, dynamic-mask
broadcast-AND, input_output_aliases); the batched kernel adds four new
constructs on top of the validated single-panel kernel:

  v1  grid + program_id written to a full-array SMEM output (dynamic
      scalar store to SMEM)
  v2  + dynamic SMEM scalar READ (scalars_ref[b, 0])
  v3  + (B, 1, n) VMEM blocked output written through a row-0 view
  v4  + lax.while_loop inside the grid body
  v5  the real batched rrLU kernel, one small panel

Each variant compiles AND executes on the real chip; first failure names
the culprit. Prints one JSON line.
"""

import json

import numpy as np

from _common import finish, setup_cache


def main():
    setup_cache()
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = 4, 256
    out = {}

    def run(name, fn):
        try:
            r = fn()
            out[name] = {"ok": True, "check": r}
        except Exception as e:  # noqa: BLE001
            out[name] = {"ok": False,
                         "error": f"{type(e).__name__}: {e}"[:200]}

    # --- v1: grid + dynamic scalar store to full SMEM output ---------------
    def v1():
        def kern(o_ref):
            b = pl.program_id(0)
            o_ref[b, 0] = b
            o_ref[b, 1] = b + 1

        r = pl.pallas_call(
            kern, grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, 2), jnp.int32),
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )()
        return np.asarray(r)[:, 0].tolist()

    run("v1_smem_dyn_store", v1)

    # --- v2: + dynamic SMEM scalar read -------------------------------------
    def v2():
        def kern(s_ref, o_ref):
            b = pl.program_id(0)
            o_ref[b, 0] = s_ref[b, 0] * 2
            o_ref[b, 1] = s_ref[b, 2]

        s = jnp.arange(B * 3, dtype=jnp.int32).reshape(B, 3)
        r = pl.pallas_call(
            kern, grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, 2), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(s)
        return np.asarray(r)[:, 0].tolist()

    run("v2_smem_dyn_read", v2)

    # --- v3: + (B,1,n) blocked VMEM output through a row-0 view ------------
    def v3():
        def kern(s_ref, v_ref, o_ref):
            b = pl.program_id(0)
            v_ref[0] = (
                jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
                + s_ref[b, 0]
            )
            o_ref[b, 0] = s_ref[b, 0]
            o_ref[b, 1] = b

        s = jnp.arange(B * 3, dtype=jnp.int32).reshape(B, 3)
        v, r = pl.pallas_call(
            kern, grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, 1, n), jnp.int32),
                       jax.ShapeDtypeStruct((B, 2), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((None, 1, n), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        )(s)
        return np.asarray(v)[:, 0, 0].tolist()

    run("v3_b1n_blocked_out", v3)

    # --- v4: + while_loop in the grid body ----------------------------------
    def v4():
        def kern(s_ref, v_ref, o_ref):
            b = pl.program_id(0)
            lim = s_ref[b, 0]

            def body(st):
                k, acc = st
                return k + 1, acc + k

            k, acc = jax.lax.while_loop(
                lambda st: st[0] < lim, body,
                (jnp.int32(0), jnp.int32(0)),
            )
            v_ref[0] = jnp.full((n,), acc, jnp.int32)
            o_ref[b, 0] = acc
            o_ref[b, 1] = k

        s = (jnp.arange(B, dtype=jnp.int32)[:, None] + 2) * jnp.ones(
            (1, 3), jnp.int32)
        v, r = pl.pallas_call(
            kern, grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, 1, n), jnp.int32),
                       jax.ShapeDtypeStruct((B, 2), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((None, 1, n), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        )(s)
        return np.asarray(r)[:, 0].tolist()

    run("v4_while_loop", v4)

    # --- v4b: f32 SMEM dynamic read + store in grid --------------------------
    def v4b():
        def kern(s_ref, v_ref, o_ref):
            b = pl.program_id(0)
            t = s_ref[b, 0]
            v_ref[0] = jnp.full((n,), t * 2.0, jnp.float32)
            o_ref[b, 0] = t + 1.0
            o_ref[b, 1] = t

        s = jnp.arange(B * 2, dtype=jnp.float32).reshape(B, 2)
        v, r = pl.pallas_call(
            kern, grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
                       jax.ShapeDtypeStruct((B, 2), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((None, 1, n), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        )(s)
        return np.asarray(r)[:, 0].tolist()

    run("v4b_f32_smem", v4b)

    # --- v4c: row-0 RMW of a (1,n) blocked output inside a while_loop -------
    def v4c():
        def kern(s_ref, v_ref, o_ref):
            b = pl.program_id(0)
            lim = s_ref[b, 0]
            v_ref[0] = jnp.zeros((n,), jnp.int32)

            def body(st):
                v_ref[0] = v_ref[0] + 1
                return (st[0] + 1,)

            (k,) = jax.lax.while_loop(
                lambda st: st[0] < lim, body, (jnp.int32(0),)
            )
            o_ref[b, 0] = k
            o_ref[b, 1] = b

        s = (jnp.arange(B, dtype=jnp.int32)[:, None] + 2) * jnp.ones(
            (1, 3), jnp.int32)
        v, r = pl.pallas_call(
            kern, grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, 1, n), jnp.int32),
                       jax.ShapeDtypeStruct((B, 2), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((None, 1, n), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        )(s)
        return np.asarray(v)[:, 0, 0].tolist()

    run("v4c_row0_rmw_in_loop", v4c)

    # --- v5a: single-panel kernel at the same panel shape (control) ---------
    def v5a():
        import jax.numpy as jnp

        from tci_tpu.ops.pallas_lu import pallas_rrlu_call

        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        r = pallas_rrlu_call(
            A, jnp.int32(64), jnp.int32(128), jnp.int32(32),
            jnp.float64(1e-6), jnp.float64(0.0), leftorthogonal=True,
        )
        return int(np.asarray(r[3]))

    run("v5a_single_panel_64x128", v5a)

    # --- v5: the real batched kernel, one small panel -----------------------
    def v5():
        from tci_tpu.ops.pallas_lu import pallas_rrlu_batched

        rng = np.random.default_rng(0)
        A = jnp.asarray(
            rng.standard_normal((B, 64, 128)).astype(np.float32))
        ones = jnp.ones((B,), jnp.int32)
        r = pallas_rrlu_batched(
            A, ones * 64, ones * 128, ones * 32,
            jnp.full((B,), 1e-6, jnp.float32),
            jnp.zeros((B,), jnp.float32),
            leftorthogonal=True,
        )
        return np.asarray(r[3]).tolist()

    run("v5_batched_rrlu_small", v5)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
    finish()
