"""Progressive rendering with sample-level checkpoint / resume.

The reference has no checkpointing at all — partial progress lives only in
the ImageBuilder's memory and dies with the process (SURVEY.md §5).  Its
work-unit/row-accumulator design is checkpoint-shaped though, and with
counter-based deterministic sampling a checkpoint becomes trivial and
*exact*: the accumulator is a pure sum over disjoint sample-index ranges,
so persisting (radiance-sum, samples_done) lets a resumed process continue
the identical sample stream and produce the bit-identical final image.

A :class:`ProgressiveRenderer` renders the full frame in sample passes
(useful on its own for preview-quality-first rendering) and can snapshot
after any pass.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from .render import Renderer
from .scene import SceneData

__all__ = ["ProgressiveRenderer", "save_checkpoint", "load_checkpoint"]

_FORMAT = 2


def _config_fingerprint(
    sd: SceneData,
    root: int,
    depth: int,
    seed: int,
    nee: bool = False,
    physical: bool = False,
) -> str:
    """Hash of everything that determines the accumulated estimator; a
    checkpoint only resumes into an identical configuration (mixing NEE and
    BSDF-only sample sums would silently blend two estimators)."""
    cfg = {"scene": sd.to_dict(), "root": root, "depth": depth, "seed": seed}
    # Sample-stream version: bumped whenever the deterministic sampler
    # construction changes (a resumed accumulator must continue the SAME
    # stream; blending two streams is statistically fine but silently
    # breaks the exact-resume guarantee). v2: murmur-finalizer randfloat +
    # per-depth bounce_point (MJ at depth 1, jittered beyond).
    cfg["sampler"] = 2
    # Transport version: bumped on bit-level changes to the walk itself.
    # v2 = prev-shape self-re-hit exclusion (ops/intersect.sphere_t
    # ``on_self``): grazing-ray bounces that f32 noise used to capture no
    # longer are, so resumed sums must not mix the two walks.
    cfg["transport"] = 2
    # Estimator flags enter the hash only when set, so checkpoints written
    # before a flag existed (or with it off) keep their fingerprints.
    if nee:
        # NEE estimator version: v2 = exact sphere-lane shadow t_l (the
        # round-4 advisor fix — the (1−1e-4) shrink is triangle-only now),
        # a bit-level estimator change; resumed sums must not mix versions.
        cfg["nee"] = 2
    if physical:
        cfg["physical"] = True
    if nee and physical:
        # MIS estimator version: v2 = partial-cone clipped light density on
        # BOTH balance-heuristic sides (round 5; was whole-cone) — a
        # bit-level estimator change; resumed sums must not mix versions.
        cfg["mis"] = 2
    blob = json.dumps(cfg, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()


def save_checkpoint(
    path: str,
    acc: np.ndarray,
    samples_done: int,
    fingerprint: str,
    lum_sq: Optional[np.ndarray] = None,
) -> None:
    tmp = path + ".tmp"
    # Zero-filled moments are indistinguishable from converged pixels, so
    # trustworthiness is recorded explicitly: a resume without real moments
    # must disable the adaptive-stop statistics, not fake perfect ones.
    stats_valid = lum_sq is not None
    if lum_sq is None:
        lum_sq = np.zeros(acc.shape[:2], np.float32)
    np.savez_compressed(
        tmp,  # numpy appends .npz (tmp never carries it; see actual_tmp)
        format=np.int32(_FORMAT),
        acc=np.asarray(acc, np.float32),
        lum_sq=np.asarray(lum_sq, np.float32),
        stats_valid=np.bool_(stats_valid),
        samples_done=np.int64(samples_done),
        fingerprint=np.frombuffer(fingerprint.encode(), np.uint8),
    )
    os.replace(tmp + ".npz", path)


def load_checkpoint(path: str):
    with np.load(path) as z:
        fmt = int(z["format"])
        if fmt not in (1, 2):
            raise ValueError(f"unsupported checkpoint format {fmt}")
        acc = z["acc"].astype(np.float32)
        if fmt >= 2:
            lum_sq = z["lum_sq"].astype(np.float32)
            stats_valid = bool(z["stats_valid"]) if "stats_valid" in z else True
        else:  # format 1 predates the moments; zeros would fake convergence
            lum_sq = np.zeros(acc.shape[:2], np.float32)
            stats_valid = False
        return (
            acc,
            int(z["samples_done"]),
            z["fingerprint"].tobytes().decode(),
            lum_sq,
            stats_valid,
        )


class ProgressiveRenderer:
    """Full-frame renderer that accumulates sample passes and can
    checkpoint/resume between them.

    Passes iterate the global sample index [0, root²) in chunks; after each
    pass :meth:`peek` returns the current (averaged, tone-mapped) image —
    progressively refining, which is what the reference's live preview
    approximates spatially with row streaming.
    """

    def __init__(
        self,
        scene_data: SceneData,
        sample_root: int,
        max_depth: int,
        seed: int = 0,
        target_lanes: int = 32 << 20,
        rows_per_band: Optional[int] = None,
        accel: Optional[str] = None,
        nee: bool = False,
        physical: bool = False,
        renderer=None,
    ):
        """``renderer`` overrides the default single-device
        :class:`~flux_tpu.render.Renderer` with any object exposing the
        ``render_rows_sum_range(row0, n_rows, s0, n, with_stats=True)``
        surface — in particular a
        :class:`~flux_tpu.parallel.MeshRenderer`, which runs every pass
        cooperatively on the whole device mesh.  It must have been built
        with the SAME (scene, root, depth, seed, nee, physical)
        configuration; those attributes are read off the renderer so the
        checkpoint fingerprint stays estimator-exact.

        Bit-exactness across device counts: with ROWS-sharded meshes
        (spp_shards=1 — the progressive default in the CLI) every pixel's
        sample reduction runs on exactly one device over the same index
        range, so accumulators, adaptive-stop statistics, and checkpoints
        are bit-identical between 1-device and N-device runs and freely
        interchangeable between them.  spp-sharded meshes stay
        deterministic for a fixed topology, but the cross-device psum
        associates the sum differently from a single device — last-ulp
        differences, statistically identical, not bit-equal across
        topologies."""
        if renderer is None:
            renderer = Renderer(
                scene_data, sample_root, max_depth, seed=seed,
                target_lanes=target_lanes, accel=accel, nee=nee,
                physical=physical,
            )
        self._r = renderer
        self.width = self._r.width
        self.height = self._r.height
        self.root = self._r.root
        self.spp = self.root * self.root
        self.fingerprint = _config_fingerprint(
            scene_data, self.root, self._r.max_depth, self._r.seed,
            nee=self._r.nee, physical=self._r.physical,
        )
        self.acc = np.zeros((self.height, self.width, 3), np.float32)
        self.samples_done = 0
        self._rows_per_band = rows_per_band or min(self.height, 128)
        # Per-pixel sum of squared sample luminances (adaptive sampling).
        self.lum_sq = np.zeros((self.height, self.width), np.float32)
        # False after resuming a checkpoint that carries no real moments —
        # the totals would under-count variance forever, so the adaptive
        # stop signal stays disabled for that render.
        self._stats_valid = True

    @classmethod
    def from_renderer(cls, renderer, rows_per_band: Optional[int] = None):
        """Wrap an already-built Renderer / MeshRenderer for progressive
        accumulation (its scene/sampling configuration is authoritative)."""
        return cls(
            renderer.scene_data,
            renderer.root,
            renderer.max_depth,
            seed=renderer.seed,
            rows_per_band=rows_per_band,
            renderer=renderer,
        )

    def render_pass(self, n_samples: int) -> int:
        """Accumulate the next ``n_samples`` sample indices across the whole
        frame. Returns samples actually added (clipped at root²)."""
        n = min(n_samples, self.spp - self.samples_done)
        if n <= 0:
            return 0
        r = self._r
        for row0 in range(0, self.height, self._rows_per_band):
            n_rows = min(self._rows_per_band, self.height - row0)
            part = np.asarray(
                r.render_rows_sum_range(
                    row0, n_rows, self.samples_done, n, with_stats=True
                )
            )
            self.acc[row0 : row0 + n_rows] += part[..., :3]
            self.lum_sq[row0 : row0 + n_rows] += part[..., 3]
        self.samples_done += n
        return n

    def max_rel_stderr(self, percentile: float = 99.0) -> Optional[float]:
        """Relative standard error of the per-pixel mean-luminance estimate
        at the given percentile over pixels — the adaptive stop signal.

        Computed from exact per-sample moments (Σlum, Σlum²) accumulated by
        the render kernels, so it is valid for any pass sizes. The i.i.d.
        variance slightly *over*estimates the error of stratified samples —
        conservative in the right direction for a stopping rule. None until
        at least 2 samples."""
        k = self.samples_done
        if k < 2 or not self._stats_valid:
            return None
        from .color import luminance

        mean = luminance(self.acc) / k
        var = np.maximum(self.lum_sq / k - mean * mean, 0.0) * (k / (k - 1))
        stderr = np.sqrt(var / k)
        rel = stderr / np.maximum(mean, 1e-3)
        return float(np.percentile(rel, percentile))

    def peek(self) -> np.ndarray:
        """Current image: average of samples so far, tone-mapped."""
        if self.samples_done == 0:
            return np.zeros_like(self.acc)
        import jax.numpy as jnp

        from .color import max_to_one

        img = max_to_one(jnp.asarray(self.acc) * np.float32(1.0 / self.samples_done))
        return np.asarray(img)

    @property
    def complete(self) -> bool:
        return self.samples_done >= self.spp

    def save(self, path: str) -> None:
        save_checkpoint(
            path, self.acc, self.samples_done, self.fingerprint, self.lum_sq
        )

    def resume(self, path: str) -> None:
        acc, done, fp, lum_sq, stats_valid = load_checkpoint(path)
        if fp != self.fingerprint:
            raise ValueError(
                "checkpoint belongs to a different (scene, root, depth, seed, "
                "nee, physical) configuration — refusing to resume"
            )
        if acc.shape != self.acc.shape:
            raise ValueError(f"checkpoint shape {acc.shape} != {self.acc.shape}")
        self.acc = acc
        self.lum_sq = lum_sq
        self._stats_valid = stats_valid
        self.samples_done = done
