"""Precision audit CLI: f32 production path vs the f64 oracle renderer.

Renders a scene with both `flux_tpu.render.Renderer` (f32, XLA sweep) and
`flux_tpu.oracle.oracle_render` (f64 NumPy, bit-identical sample streams)
and prints the difference statistics — the escape-hatch check for suspected
f32 precision cliffs (deep recursion, extreme Phong exponents).

Usage: python tools/f64_audit.py scenes/demo1.yml [--root 8] [--depth 5]
       [--seed 0] [--width 80 --height 60] [--physical]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--root", type=int, default=8)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--physical", action="store_true")
    args = ap.parse_args()

    from dataclasses import replace

    from flux_tpu.oracle import precision_audit
    from flux_tpu.scene import OutputSettings, load_scene

    sd = load_scene(args.scene)
    if args.width or args.height:
        osx = sd.output_settings
        sd = replace(
            sd,
            output_settings=OutputSettings(
                image_width=args.width or osx.image_width,
                image_height=args.height or osx.image_height,
                pixel_size=osx.pixel_size,
            ),
        )
    report = precision_audit(
        sd, args.root, args.depth, seed=args.seed, physical=args.physical
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
