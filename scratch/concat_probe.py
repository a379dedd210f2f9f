"""Concat bandwidth decomposition (round 5).

The honest (re-submit protocol) concat number is ~25% of HBM peak
against a measured 1727 GB/s copy bound; SWAR ReLU and the single
full-width store did not move it. This probe isolates the cause:

  one      single-source 768-lane "concat" (the same call structure as
           a pure copy) — if slow, the op shape/grid is the problem
  norelu   4-source concat, post_relu=False — the ReLU term
  prod     4-source concat + relu (the bench op)
  tiles    row-tile sweep on prod (grid-step overhead amortization)

Run IN BACKGROUND with NO timeout (tunnel rules):
    python scratch/concat_probe.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_df")

import bench

bench._enable_compile_cache()

import jax
import jax.numpy as jnp

import importlib

concat_mod = importlib.import_module("deepfusion_tpu.ops.concat")

CHANS = (128, 256, 128, 256)
PEAK_BW = 819.0


def run(tag, srcs, post_relu, iters=64):
    def step(ss):
        y = concat_mod.concat(list(ss), post_relu=post_relu)
        bump = (y[0, 0, 0, 0].astype(jnp.int32) & 1).astype(jnp.int8)
        return tuple(s.at[0, 0, 0, 0].add(bump) for s in ss)

    sec = bench.timeit_chain(step, srcs, iters, reps=5, spread_s=5)
    nbytes = 2 * sum(s.size for s in srcs)
    gbps = nbytes / sec / 1e9
    print(f"# {tag:>16s} {sec*1e3:.3f} ms/iter  {gbps:5.0f} GB/s "
          f"({100*gbps/PEAK_BW:.1f}% of HBM peak)", file=sys.stderr)
    return round(gbps, 1)


def run_one_update(tag, srcs, iters=64):
    """Data dependence through source 0 only: sources 1..3 are
    loop-invariant values the opaque pallas call still re-reads every
    iteration, so only ONE in-place one-element update rides the
    carry."""
    def step(ss):
        y = concat_mod.concat(list(ss), post_relu=True)
        bump = (y[0, 0, 0, 0].astype(jnp.int32) & 1).astype(jnp.int8)
        return (ss[0].at[0, 0, 0, 0].add(bump),) + ss[1:]

    sec = bench.timeit_chain(step, srcs, iters, reps=5, spread_s=5)
    nbytes = 2 * sum(s.size for s in srcs)
    gbps = nbytes / sec / 1e9
    print(f"# {tag:>16s} {sec*1e3:.3f} ms/iter  {gbps:5.0f} GB/s "
          f"({100*gbps/PEAK_BW:.1f}% of HBM peak)", file=sys.stderr)
    return round(gbps, 1)


def run_bigcopy(iters=64):
    """The pure copy kernel (dma_probe's structure) on the concat
    workload's bytes/shape: isolates chain overhead from kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from deepfusion_tpu.utils import env

    rng = np.random.default_rng(1)
    x = jax.device_put(rng.integers(-10, 11, (4, 59536, 768))
                       .astype(np.int8))
    tile = 2048
    spec = pl.BlockSpec((1, tile, 768), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)

    def kern(src_ref, out_ref):
        out_ref[...] = src_ref[...]

    call = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(4, 59536 // tile + 1), in_specs=[spec], out_specs=spec,
        compiler_params=env.tpu_compiler_params(("parallel", "parallel")),
        interpret=env.interpret_kernels())

    def step(xx):
        out = call(xx)
        b = out[0, 0, 0].astype(jnp.int8) & 1
        return xx.at[0, 0, 0].add(b)

    sec = bench.timeit_chain(step, x, iters, reps=5, spread_s=5)
    nbytes = 2 * x.size
    gbps = nbytes / sec / 1e9
    print(f"# {'bigcopy':>16s} {sec*1e3:.3f} ms/iter  {gbps:5.0f} GB/s "
          f"({100*gbps/PEAK_BW:.1f}% of HBM peak)", file=sys.stderr)
    return round(gbps, 1)


def main():
    rng = np.random.default_rng(0)
    srcs4 = tuple(
        jax.device_put(rng.integers(-10, 11, (4, 244, 244, c))
                       .astype(np.int8)) for c in CHANS)
    src1 = (jax.device_put(rng.integers(-10, 11, (4, 244, 244, 768))
                           .astype(np.int8)),)
    results = {}
    results["bigcopy"] = run_bigcopy()
    results["one"] = run("one-source", src1, True)
    results["one_upd"] = run_one_update("4-src one-update", srcs4)
    results["prod"] = run("4-src relu", srcs4, True)
    print(results)


if __name__ == "__main__":
    main()
