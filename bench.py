#!/usr/bin/env python
"""North-star benchmark: fvm gradient iterations (atlas-benchmark equivalent).

Mirrors the reference harness src/sandbox/apps/atlas-benchmark.cc:409-501:
per iteration, an edge loop (avgS = S * 0.5 (f1 + f2)), a signed node
accumulation divided by dual volumes, a vertical central difference, and the
halo exchange — on a reduced Gaussian grid with nlev levels.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "gridpoints/s", "vs_baseline": N}
where vs_baseline is the achieved fraction of the chip's HBM-bandwidth
roofline for this kernel's minimum memory traffic (the reference publishes no
numbers of its own — BASELINE.md).
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="O320")
    ap.add_argument("--nlev", type=int, default=64)
    ap.add_argument("--niter", type=int, default=20)
    ap.add_argument("--quick", action="store_true", help="small config for smoke tests")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    if args.quick:
        args.grid, args.nlev, args.niter = "O32", 8, 5

    import jax
    import jax.numpy as jnp

    from atlas_tpu import Grid
    from atlas_tpu.fvm import FvmMethod
    from atlas_tpu.fvm.nabla import _JaxGeom, _gradient_impl
    from atlas_tpu.util.functions import SolidBodyRotation

    dev = jax.devices()[0]
    dtype = jnp.dtype(args.dtype)

    grid = Grid(args.grid)
    t_setup = time.time()
    method = FvmMethod(grid, use_cache=True)
    geom = _JaxGeom(method.geometry, dtype)
    setup_s = time.time() - t_setup

    g = method.geometry
    nnodes, nedges, nlev = g.nnodes, g.nedges, args.nlev

    flow = SolidBodyRotation(beta=0.0, u0=20.0)
    f0 = flow.wind_magnitude(g.lonlat[:, 0], g.lonlat[:, 1]).astype(dtype)
    f = jnp.asarray(np.broadcast_to(f0[:, None], (nnodes, nlev)).copy())

    dz = 80.0e3 / nlev
    dzi_2 = jnp.asarray(0.5 / dz, dtype)

    # NOTE: geometry is passed as a pytree ARGUMENT, never closed over —
    # closing over it would bake ~50 MB of index arrays into the program as
    # constants and defeat the compile cache.
    @jax.jit
    def iteration(geom, f):
        grad_xy = _gradient_impl(geom, f)  # (nnodes, nlev, 2)
        # vertical derivative (benchmark :468-481), central in the interior
        up = jnp.concatenate([f[:, 1:2], f[:, 2:], f[:, -2:-1]], axis=1)
        dn = jnp.concatenate([f[:, 0:1], f[:, :-2], f[:, -1:]], axis=1)
        gz = (up - dn) * dzi_2
        grad = jnp.concatenate([grad_xy, gz[:, :, None]], axis=-1)
        # halo exchange: copy owner values onto ghost rows
        grad = grad.at[geom.halo_dst].set(grad[geom.halo_src])
        return grad

    # Chain iterations with a data dependency so XLA cannot elide or overlap
    # them, and block once per chain: through the device tunnel a per-iteration
    # block_until_ready would fetch the result buffer and measure transfer, not
    # compute. radius rescales grad (~f/R) back to f's magnitude.
    radius_f = jnp.asarray(6371229.0, dtype)

    @jax.jit
    def chain(geom, f, k):
        def body(_, f):
            grad = iteration(geom, f)
            return grad[:, :, 0] * radius_f

        return jax.lax.fori_loop(0, k, body, f)

    k = 10
    out = chain(geom, f, k)  # warmup / compile
    out.block_until_ready()

    times = []
    for _ in range(max(args.niter // k, 3)):
        t0 = time.perf_counter()
        out = chain(geom, f, k)
        out.block_until_ready()
        times.append((time.perf_counter() - t0) / k)
    t_iter = float(np.min(times))  # best-of like the reference's min timer

    bytes_per_elem = dtype.itemsize
    # minimum HBM traffic per iteration: f read at both edge ends, avgS
    # written + re-read twice by the accumulation gather, grad written,
    # vertical reads/writes
    traffic = (
        2 * nedges * nlev * bytes_per_elem  # edge gather of f
        + 3 * (nedges * nlev * 2 * bytes_per_elem)  # avgS write + 2 reads
        + nnodes * nlev * 3 * bytes_per_elem  # grad write
        + 2 * nnodes * nlev * bytes_per_elem  # vertical read + write
    )
    achieved_bw = traffic / t_iter
    peak_bw = 819e9  # TPU v5e HBM bandwidth [B/s]
    gridpoints_per_s = nnodes * nlev / t_iter

    result = {
        "metric": f"fvm_gradient_{args.grid}_nlev{nlev}_gridpoints_per_s",
        "value": gridpoints_per_s,
        "unit": "gridpoints/s",
        "vs_baseline": achieved_bw / peak_bw,
        "detail": {
            "grid": args.grid,
            "nnodes": int(nnodes),
            "nedges": int(nedges),
            "nlev": nlev,
            "iter_time_s": t_iter,
            "iter_time_avg_s": float(np.mean(times)),
            "setup_s": setup_s,
            "achieved_GBps": achieved_bw / 1e9,
            "roofline_note": "vs_baseline = achieved/peak HBM bandwidth (819 GB/s, v5e); reference publishes no numbers (BASELINE.md)",
            "device": str(dev),
            "dtype": str(dtype),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
