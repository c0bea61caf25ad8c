"""Command-line tools (reference: atlas src/apps/*).

    python -m atlas_tpu.cli grids [--info NAME]        (atlas-grids)
    python -m atlas_tpu.cli gaussian-latitudes N       (atlas-gaussian-latitudes)
    python -m atlas_tpu.cli grid-points NAME           (atlas-grid-points)
    python -m atlas_tpu.cli meshgen NAME out.msh       (atlas-meshgen)
    python -m atlas_tpu.cli interpolations --source A --target B --method M
    python -m atlas_tpu.cli version                    (atlas)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cmd_version(args):
    from atlas_tpu import __version__

    print(f"atlas_tpu {__version__}")
    try:
        import jax

        print(f"jax {jax.__version__}, devices: {jax.devices()}")
    except Exception:
        pass


def cmd_grids(args):
    from atlas_tpu import Grid

    if args.name:
        g = Grid(args.name)
        info = {
            "name": g.name,
            "type": type(g).__name__,
            "size": g.size,
            "uid": g.uid(),
        }
        if hasattr(g, "ny"):
            info.update(
                ny=g.ny,
                nxmax=g.nxmax,
                reduced=bool(g.reduced),
                lat_first=float(g.y[0]),
                lat_last=float(g.y[-1]),
            )
        print(json.dumps(info, indent=2))
    else:
        print("Named grid patterns:")
        for pat in [
            "O<n>    octahedral reduced Gaussian (nx = 20 + 4 j)",
            "F<n>    regular Gaussian (nx = 4n)",
            "N<n>    classic reduced Gaussian (synthesized pl)",
            "L<x>x<y>, L<n>        regular lon-lat incl. poles",
            "S/Slon/Slat<x>x<y>    shifted lon-lat variants",
            "H<n>    HEALPix (ring ordering)",
            "CS-LFR-<n>, CS-EA-<n>, CS-ED-<n>  cubed sphere",
        ]:
            print("  " + pat)


def cmd_gaussian_latitudes(args):
    from atlas_tpu.grid import gaussian_quadrature_npole_spole

    lats, w = gaussian_quadrature_npole_spole(2 * args.N)
    for lat, wt in zip(lats, w):
        print(f"{lat:.14f} {wt:.14e}")


def cmd_grid_points(args):
    from atlas_tpu import Grid

    g = Grid(args.name)
    ll = g.lonlat()
    n = len(ll) if args.all else min(len(ll), 20)
    for i in range(n):
        print(f"{ll[i,0]:.10f} {ll[i,1]:.10f}")
    if n < len(ll):
        print(f"... ({len(ll)} points total; use --all)")


def cmd_meshgen(args):
    from atlas_tpu import Grid
    from atlas_tpu.mesh import generate_mesh, build_edges
    from atlas_tpu.output import write_gmsh

    g = Grid(args.name)
    mesh = generate_mesh(g)
    if args.edges:
        mesh = build_edges(mesh, g)
    write_gmsh(mesh, args.out, coordinates=args.coordinates, ghost=args.ghost)
    print(
        f"wrote {args.out}: {mesh.nb_nodes} nodes, {mesh.nb_cells} cells"
        + (f", {mesh.nb_edges} edges" if args.edges else "")
    )


def cmd_interpolations(args):
    from atlas_tpu import Grid
    from atlas_tpu.interpolation import Interpolation
    from atlas_tpu.util.functions import vortex_rollup

    src = Grid(args.source)
    tgt = Grid(args.target)
    interp = Interpolation(args.method, src, tgt)
    ll = src.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    out = np.asarray(interp.execute(f))
    tll = tgt.lonlat()
    ref = vortex_rollup(tll[:, 0], tll[:, 1], 0.5)
    err = np.abs(out - ref)
    print(
        json.dumps(
            {
                "source": src.name,
                "target": tgt.name,
                "method": args.method,
                "max_err": float(err.max()),
                "mean_err": float(err.mean()),
            }
        )
    )


def cmd_bench(args):
    import subprocess

    sys.exit(subprocess.call([sys.executable, "bench.py"] + args.rest))


def _ensure_jax_backend():
    """Fall back to an available backend when the env pins an absent plugin
    (e.g. JAX_PLATFORMS=axon without the axon sitecustomize on PYTHONPATH)."""
    try:
        import jax

        try:
            jax.devices()
        except RuntimeError:
            jax.config.update("jax_platforms", "")
            jax.devices()
    except ImportError:
        pass


def main(argv=None):
    _ensure_jax_backend()
    p = argparse.ArgumentParser(prog="atlas_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("version")
    sp = sub.add_parser("grids")
    sp.add_argument("name", nargs="?", default=None)
    sp = sub.add_parser("gaussian-latitudes")
    sp.add_argument("N", type=int)
    sp = sub.add_parser("grid-points")
    sp.add_argument("name")
    sp.add_argument("--all", action="store_true")
    sp = sub.add_parser("meshgen")
    sp.add_argument("name")
    sp.add_argument("out")
    sp.add_argument("--coordinates", default="lonlat", choices=["lonlat", "xy", "xyz"])
    sp.add_argument("--ghost", action="store_true")
    sp.add_argument("--edges", action="store_true")
    sp = sub.add_parser("interpolations")
    sp.add_argument("--source", required=True)
    sp.add_argument("--target", required=True)
    sp.add_argument("--method", default="structured-bicubic")

    args = p.parse_args(argv)
    {
        "version": cmd_version,
        "grids": cmd_grids,
        "gaussian-latitudes": cmd_gaussian_latitudes,
        "grid-points": cmd_grid_points,
        "meshgen": cmd_meshgen,
        "interpolations": cmd_interpolations,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
