"""Micro-measure backward cost of the executor's building blocks on TPU.

Times are measured by chaining ITERS invocations inside one jit (a scan
with a data dependency) and blocking once — raw per-call dispatch through
the axon tunnel costs ~30 ms and would swamp the numbers otherwise.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, F, H, T, G = 128, 64, 512, 13, 11
NV, NF, NA = 9, 3, 4
ITERS = 8


def chained_time(name, scalar_fn, video, *rest):
    """scalar_fn(video, *rest) -> scalar; chained via a perturbation."""

    @jax.jit
    def run(video, *rest):
        def body(acc, _):
            v = video + (acc * 1e-12).astype(video.dtype)
            return scalar_fn(v, *rest), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    out = run(video, *rest)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(video, *rest)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


def grad_scalar(fn, argnums=0):
    g = jax.grad(fn, argnums=argnums)

    def scalar(*args):
        grads = g(*args)
        return sum(
            jnp.sum(x.astype(jnp.float32) ** 2)
            for x in jax.tree_util.tree_leaves(grads)
        )

    return scalar


def main():
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(B, F, H), jnp.bfloat16)
    tables = jnp.asarray(rng.randn(G, H, H) * 0.05, jnp.bfloat16)
    idx_fa = jnp.asarray(rng.randint(0, NF + 1, (T, B)), jnp.int32)
    idx_out = jnp.asarray(rng.randint(1, NF + 1, (T, B)), jnp.int32)
    e1 = jnp.asarray(rng.randint(0, G, (T, B)), jnp.int32)

    def regs_only(video):
        rf0 = jnp.zeros((B, NF + 1, F, H), jnp.bfloat16)
        rf0 = rf0.at[:, 0].set(video)

        def body(rf, sc):
            ia, io = sc
            fa = rf[jnp.arange(B), ia]
            new = fa * 1.01 + 0.1
            rf = rf.at[jnp.arange(B), io].set(new)
            return rf, None

        rf, _ = jax.lax.scan(body, rf0, (idx_fa, idx_out))
        return jnp.sum(rf.astype(jnp.float32) ** 2)

    def onehot_regs(video):
        rf0 = jnp.zeros((B, NF + 1, F, H), jnp.bfloat16)
        rf0 = rf0.at[:, 0].set(video)

        def body(rf, sc):
            ia, io = sc
            oh_a = jax.nn.one_hot(ia, NF + 1, dtype=rf.dtype)
            fa = jnp.einsum("bn,bnfh->bfh", oh_a, rf)
            new = fa * 1.01 + 0.1
            oh_o = jax.nn.one_hot(io, NF + 1, dtype=rf.dtype)
            rf = rf * (1 - oh_o[:, :, None, None]) + (
                oh_o[:, :, None, None] * new[:, None]
            )
            return rf, None

        rf, _ = jax.lax.scan(body, rf0, (idx_fa, idx_out))
        return jnp.sum(rf.astype(jnp.float32) ** 2)

    def three_stage(video, tables):
        rf0 = jnp.zeros((B, NF + 1, F, H), jnp.bfloat16)
        rf0 = rf0.at[:, 0].set(video)

        def body(rf, sc):
            ia, io, e = sc
            fa = rf[jnp.arange(B), ia]
            perm = jnp.argsort(e)
            inv = jnp.argsort(perm)
            gs = jnp.bincount(e, length=G).astype(jnp.int32)

            def stage(x):
                return jax.lax.ragged_dot(
                    x[perm].reshape(B * F, H), tables, gs * F,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16).reshape(B, F, H)[inv]

            y = jax.nn.relu(stage(fa))
            y = jax.nn.relu(stage(y))
            y = jax.nn.relu(stage(y))
            rf = rf.at[jnp.arange(B), io].set(y)
            return rf, None

        rf, _ = jax.lax.scan(body, rf0, (idx_fa, idx_out, e1))
        return jnp.sum(rf.astype(jnp.float32) ** 2)

    # Stages WITHOUT the permutes (sorted assumed): isolates permute cost.
    def three_stage_noperm(video, tables):
        rf0 = jnp.zeros((B, NF + 1, F, H), jnp.bfloat16)
        rf0 = rf0.at[:, 0].set(video)

        def body(rf, sc):
            ia, io, e = sc
            fa = rf[jnp.arange(B), ia]
            gs = jnp.bincount(e, length=G).astype(jnp.int32)

            def stage(x):
                return jax.lax.ragged_dot(
                    x.reshape(B * F, H), tables, gs * F,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16).reshape(B, F, H)

            y = jax.nn.relu(stage(fa))
            y = jax.nn.relu(stage(y))
            y = jax.nn.relu(stage(y))
            rf = rf.at[jnp.arange(B), io].set(y)
            return rf, None

        rf, _ = jax.lax.scan(body, rf0, (idx_fa, idx_out, e1))
        return jnp.sum(rf.astype(jnp.float32) ** 2)

    chained_time("regs fwd", regs_only, video)
    chained_time("regs grad", grad_scalar(regs_only), video)
    chained_time("onehot fwd", onehot_regs, video)
    chained_time("onehot grad", grad_scalar(onehot_regs), video)
    chained_time("3stage fwd", three_stage, video, tables)
    chained_time("3stage grad", grad_scalar(three_stage, (0, 1)),
                 video, tables)
    chained_time("3stage-noperm fwd", three_stage_noperm, video, tables)
    chained_time("3stage-noperm grad",
                 grad_scalar(three_stage_noperm, (0, 1)), video, tables)


if __name__ == "__main__":
    main()
