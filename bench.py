"""Benchmark: the reference's headline workload on one TPU chip.

Reference baseline (BASELINE.md / README.md:1): scenes/demo2.yml at 16384
spp (sample_root=128, depth 5, 800×600) took 1479.900397 s on 44 CPU cores
= 5.31 Msamples/s for the whole box.  This benchmark renders the *same*
workload end-to-end on a single TPU chip and reports primary-sample
throughput; ``vs_baseline`` is the ratio to the 44-core box's throughput
(equivalently, the wall-clock speedup on the identical workload).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MSAMPLES_PER_S = 800 * 600 * 16384 / 1479.900397 / 1e6  # 5.314

ROOT = 128  # sample_root -> 16384 spp (README headline)
DEPTH = 5
W, H = 800, 600


def main():
    import jax

    from flux_tpu.render import Renderer, finalize
    from flux_tpu.scene import load_scene

    here = os.path.dirname(os.path.abspath(__file__))
    sd = load_scene(os.path.join(here, "scenes", "demo2.yml"))
    assert sd.output_settings.image_width == W and sd.output_settings.image_height == H

    n_dev = jax.device_count()
    r = Renderer(sd, sample_root=ROOT, max_depth=DEPTH, seed=0)

    # Warm up / compile both chunk shapes on a single band.
    r.render_rows(0, H)

    # Sustained throughput: best of three full renders (the axon tunnel
    # adds ±10% single-run jitter, NOTES.md; every run is a complete
    # 16384-spp frame and all times are disclosed below).
    walls = []
    for _ in range(3):
        t0 = time.time()
        img = r.render_image(rows_per_band=H)
        walls.append(time.time() - t0)
    wall = min(walls)

    samples = W * H * ROOT * ROOT
    msps = samples / wall / 1e6
    msps_per_chip = msps / max(1, 1)  # bench drives exactly one chip

    # Persist the render as evidence next to the bench result.
    try:
        from flux_tpu.image import write_png

        os.makedirs(os.path.join(here, "artifacts"), exist_ok=True)
        write_png(os.path.join(here, "artifacts", "demo2_16384spp.png"), img)
    except Exception:
        pass

    # Secondary metrics (never allowed to fail the headline): NEE quality
    # mode and the large-scene scan path, written to artifacts only — the
    # stdout contract stays exactly one JSON line.  Each secondary is
    # best-of-3 on a warm process: these renders are only ~0.5-3 s, so a
    # single run is dominated by the axon tunnel's ±10% jitter (history
    # showed 304/447/352 Msamples/s for demo2_nee across three rounds of
    # unchanged code; the headline, at ~8 s/run, was stable).
    def best_wall(render, reps=3):
        ws = []
        for _ in range(reps):
            t0 = time.time()
            render()
            ws.append(time.time() - t0)
        return min(ws), ws

    extra = {}
    try:
        r2 = Renderer(sd, sample_root=32, max_depth=DEPTH, seed=0, nee=True)
        r2.render_rows(0, H)
        w2, runs2 = best_wall(lambda: r2.render_image(rows_per_band=H))
        extra["demo2_nee_1024spp"] = {
            "wall_clock_s": round(w2, 2),
            "msamples_per_s": round(W * H * 1024 / w2 / 1e6, 1),
            "all_runs_s": [round(w, 2) for w in runs2],
        }
    except Exception as e:
        extra["demo2_nee_1024spp"] = {"error": repr(e)}
    try:
        sd3 = load_scene(os.path.join(here, "scenes", "spheres512.yml"))
        r3 = Renderer(sd3, sample_root=8, max_depth=DEPTH, seed=0)
        r3.render_rows(0, H)
        w3, runs3 = best_wall(lambda: r3.render_image(rows_per_band=H))
        extra["spheres512_64spp_scan"] = {
            "wall_clock_s": round(w3, 2),
            "msamples_per_s": round(W * H * 64 / w3 / 1e6, 1),
            "all_runs_s": [round(w, 2) for w in runs3],
        }
    except Exception as e:
        extra["spheres512_64spp_scan"] = {"error": repr(e)}
    try:
        # Triangle-mesh geometry through the megakernel's blocked Morton
        # triangle fold (PERFORMANCE.md "Triangle meshes" table).
        from flux_tpu.meshgen import icosphere, mesh_scene

        v, fc = icosphere(3)  # 1280 triangles
        sd4 = mesh_scene(v, fc, width=W, height=H)
        r4 = Renderer(sd4, sample_root=4, max_depth=DEPTH, seed=0)
        r4.render_rows(0, H)
        w4, runs4 = best_wall(lambda: r4.render_image(rows_per_band=H))
        extra["mesh1280_16spp"] = {
            "wall_clock_s": round(w4, 2),
            "msamples_per_s": round(W * H * 16 / w4 / 1e6, 1),
            "all_runs_s": [round(w, 2) for w in runs4],
            "backend": r4.backend,
        }
    except Exception as e:
        extra["mesh1280_16spp"] = {"error": repr(e)}
    try:
        # Cornell box (demo5): a triangle QUAD light sampled in-kernel —
        # the megakernel's triangle-light NEE path (round 3).
        sd5 = load_scene(os.path.join(here, "scenes", "demo5.yml"))
        w5_, h5_ = (sd5.output_settings.image_width,
                    sd5.output_settings.image_height)
        r5 = Renderer(sd5, sample_root=32, max_depth=DEPTH, seed=0, nee=True)
        r5.render_rows(0, h5_)
        w5, runs5 = best_wall(lambda: r5.render_image(rows_per_band=h5_))
        extra["cornell_tri_light_nee_1024spp"] = {
            "wall_clock_s": round(w5, 2),
            "msamples_per_s": round(w5_ * h5_ * 1024 / w5 / 1e6, 1),
            "all_runs_s": [round(w, 2) for w in runs5],
            "backend": r5.backend,
        }
    except Exception as e:
        extra["cornell_tri_light_nee_1024spp"] = {"error": repr(e)}
    try:
        # demo3 physical MIS (the 27×-MSE showcase of PERFORMANCE.md):
        # frame time best-of-3 AND image quality (MSE vs a 1024-spp
        # converged truth rendered in the same mode) — so an estimator
        # regression shows up as an MSE jump even at unchanged speed.
        sd6 = load_scene(os.path.join(here, "scenes", "demo3.yml"))
        w6_, h6_ = (sd6.output_settings.image_width,
                    sd6.output_settings.image_height)
        r6t = Renderer(sd6, sample_root=32, max_depth=DEPTH, seed=7,
                       nee=True, physical=True)
        truth = r6t.render_image(rows_per_band=h6_)
        r6 = Renderer(sd6, sample_root=4, max_depth=DEPTH, seed=0,
                      nee=True, physical=True)
        r6.render_rows(0, h6_)
        img6 = [None]

        def _mis_frame():
            img6[0] = r6.render_image(rows_per_band=h6_)

        w6, runs6 = best_wall(_mis_frame)
        extra["demo3_physical_mis_16spp"] = {
            "wall_clock_s": round(w6, 2),
            "msamples_per_s": round(w6_ * h6_ * 16 / w6 / 1e6, 1),
            "all_runs_s": [round(w, 2) for w in runs6],
            "mse_vs_1024spp": round(
                float(((img6[0] - truth) ** 2).mean()), 6
            ),
        }
    except Exception as e:
        extra["demo3_physical_mis_16spp"] = {"error": repr(e)}
    try:
        # Adaptive-stop progressive pass on demo2: drives the
        # ProgressiveRenderer + per-pixel variance channel end-to-end and
        # records where the noise target stops it — regressions in the
        # stats channel or the stop logic are visible as spp/wall jumps.
        from flux_tpu.checkpoint import ProgressiveRenderer

        # Warm the with_stats pass shape (n_samples is static in the
        # launch, so the warmup must use the same 64-sample pass) on a
        # throwaway renderer: the timed loop below then measures the
        # adaptive render, not a cold compile (history showed 15.5 s vs
        # 89.6 s for identical code depending on cache warmth).
        ProgressiveRenderer(sd, sample_root=32, max_depth=DEPTH, seed=0).render_pass(64)

        pr = ProgressiveRenderer(sd, sample_root=32, max_depth=DEPTH, seed=0)
        t0 = time.time()
        # Reachable mid-run at this spp budget (p99 rel stderr measured
        # ~0.10 at the full 1024 spp): the point is to exercise the stop.
        target = 0.12
        while not pr.complete:
            pr.render_pass(64)
            err = pr.max_rel_stderr()
            if err is not None and err < target:
                break
        extra["demo2_adaptive_stop"] = {
            "wall_clock_s": round(time.time() - t0, 2),
            "spp_done": int(pr.samples_done),
            "spp_max": int(pr.spp),
            "p99_rel_stderr": round(float(err), 5) if err is not None else None,
            "noise_target": target,
        }
    except Exception as e:
        extra["demo2_adaptive_stop"] = {"error": repr(e)}
    try:
        with open(os.path.join(here, "artifacts", "bench_extra.json"), "w") as f:
            json.dump(extra, f, indent=1)
    except Exception:
        pass

    result = {
        "metric": "demo2_16384spp_throughput",
        "value": round(msps_per_chip, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps_per_chip / BASELINE_MSAMPLES_PER_S, 2),
        "wall_clock_s": round(wall, 2),
        "all_runs_s": [round(w, 2) for w in walls],
        "baseline_wall_clock_s": 1479.9,
        "spp": ROOT * ROOT,
        "devices": n_dev,
    }

    # Regression contract: every bench run appends (headline + secondary
    # numbers) to a history log, and a soft warning goes to STDERR when the
    # headline drops more than the axon tunnel's observed run-to-run noise
    # (±10%, NOTES.md) below the best recorded run. stdout stays exactly
    # one JSON line.
    try:
        hist_path = os.path.join(here, "artifacts", "bench_history.jsonl")
        prev_best = None
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    if rec.get("metric") == result["metric"]:
                        v = rec.get("value")
                        if v and (prev_best is None or v > prev_best):
                            prev_best = v
        with open(hist_path, "a") as f:
            f.write(
                json.dumps(
                    {"when": time.strftime("%Y-%m-%dT%H:%M:%S"), **result,
                     "extra": extra}
                )
                + "\n"
            )
        if prev_best is not None and result["value"] < 0.88 * prev_best:
            print(
                f"bench WARNING: headline {result['value']} Msamples/s/chip is "
                f">12% below the best recorded run ({prev_best}) — possible "
                f"regression (see {hist_path})",
                file=sys.stderr,
            )
    except Exception:
        pass

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
