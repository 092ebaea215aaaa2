"""Perf harness for kernel-optimization work: repeated demo2 headline renders
in one process, reporting min/median wall time.

The axon tunnel has ±10% run-to-run variance on single renders (NOTES.md);
``bench.py`` (the driver contract) stays a single cold run, while this tool
takes min-of-N on a warm process so A/B deltas of a few percent are
measurable. Not part of the driver contract.

Usage: python perf.py [--root 128] [--reps 5] [--nee] [--scene PATH]
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--nee", action="store_true")
    ap.add_argument("--scene", default=None)
    ap.add_argument(
        "--field", type=int, default=None,
        help="procedural sphere_field(N) workload instead of --scene",
    )
    ap.add_argument("--field-seed", type=int, default=1)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument(
        "--mesh-tris", type=int, default=None,
        help="procedural triangle-mesh workload with ~N triangles",
    )
    ap.add_argument("--accel", default=None)
    ap.add_argument("--s-blk", type=int, default=None)
    ap.add_argument(
        "--early-exit", default="true", choices=["true", "false", "cond"],
        help="megakernel early-exit form: scratch state machine (true), "
        "register-carried lax.cond (cond), or straight-line (false)",
    )
    args = ap.parse_args()
    early_exit = {"true": True, "false": False, "cond": "cond"}[args.early_exit]

    from flux_tpu.render import Renderer
    from flux_tpu.scene import load_scene

    here = os.path.dirname(os.path.abspath(__file__))
    if args.field is not None:
        from flux_tpu.genscene import sphere_field

        sd = sphere_field(
            args.field, seed=args.field_seed,
            width=args.width or 400, height=args.height or 300,
            spread=14.0 * (args.field / 512.0) ** 0.5,
        )
    elif args.mesh_tris is not None:
        from flux_tpu.meshgen import icosphere, mesh_scene

        subdiv = max(1, int(np.ceil(np.log(args.mesh_tris / 20) / np.log(4))))
        v, f = icosphere(subdiv)  # 20·4^subdiv triangles
        sd = mesh_scene(
            v, f, width=args.width or 400, height=args.height or 300
        )
    else:
        sd = load_scene(args.scene or os.path.join(here, "scenes", "demo2.yml"))
    w = sd.output_settings.image_width
    h = sd.output_settings.image_height

    r = Renderer(sd, sample_root=args.root, max_depth=args.depth, seed=0,
                 nee=args.nee, accel=args.accel, early_exit=early_exit)
    if args.s_blk is not None:
        # Override the megakernel tile height for sweeps (experiment only).
        import flux_tpu.ops.pallas_kernel as pk

        pk.S_BLK = args.s_blk

    r.render_rows(0, h)  # compile + warm
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        img = r.render_image(rows_per_band=h)
        times.append(time.time() - t0)
    samples = w * h * args.root * args.root
    best = min(times)
    med = sorted(times)[len(times) // 2]
    print(json.dumps({
        "wall_min_s": round(best, 3),
        "wall_med_s": round(med, 3),
        "msamples_per_s_best": round(samples / best / 1e6, 1),
        "msamples_per_s_med": round(samples / med / 1e6, 1),
        "times": [round(t, 3) for t in times],
        "checksum": float(np.asarray(img, np.float64).mean()),
    }))


if __name__ == "__main__":
    main()
