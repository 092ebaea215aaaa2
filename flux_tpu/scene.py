"""Scene schema, YAML loading, and compilation to device struct-of-arrays.

This is the reference's ``SceneData`` → ``Scene`` split reborn for TPU
(fluxcore/src/scene.rs:37-74,76-85): the serializable side stays plain Python
dataclasses accepting the *exact* reference YAML schema (scenes/demo1.yml and
demo2.yml load unmodified, anchors included; schema shapes from
fluxcore/src/scene.rs:42-74 and shapes.rs:15-81), while the runtime side —
trait objects in the reference (scene.rs:128-154) — becomes a pytree of
device-resident arrays (:class:`SceneArrays`): sphere centers/radii/flags,
plane points/normals, and a flat material parameter table indexed by shape.
The whole scene is then one gather away from any ray lane, with no virtual
dispatch on the hot path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import yaml

__all__ = [
    "MaterialKind",
    "MaterialData",
    "SphereData",
    "PlaneData",
    "TriangleData",
    "CameraSettings",
    "CameraData",
    "OutputSettings",
    "SceneData",
    "SceneArrays",
    "load_scene",
    "loads_scene",
    "compile_scene",
]


class MaterialKind:
    """Material kind codes used in the device material table."""

    MATTE = 0
    EMISSIVE = 1
    REFLECTIVE = 2
    GLOSSY = 3


_KIND_NAMES = {
    "Matte": MaterialKind.MATTE,
    "Emissive": MaterialKind.EMISSIVE,
    "Reflective": MaterialKind.REFLECTIVE,
    "GlossyReflective": MaterialKind.GLOSSY,
}
_NAME_BY_KIND = {v: k for k, v in _KIND_NAMES.items()}


def _vec3(v) -> Tuple[float, float, float]:
    x, y, z = (float(c) for c in v)
    return (x, y, z)


@dataclass(frozen=True)
class MaterialData:
    """Tagged material union (reference: shapes.rs:39-81).

    ``color`` is the kind's primary color (diffuse / emissive / reflect) and
    ``param`` its scalar weight (diffuse_coefficient / power / reflect_amount).
    ``ambient_color`` exists only for Matte; the reference parses it into an
    ambient BRDF that its path tracer never evaluates (materials.rs:19-33),
    so it is schema-preserved but unused here as well.
    """

    kind: int
    color: Tuple[float, float, float]
    param: float = 1.0
    exponent: float = 0.0
    ambient_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @staticmethod
    def from_dict(d: dict) -> "MaterialData":
        if len(d) != 1:
            raise ValueError(f"material must have exactly one variant, got {list(d)}")
        (name, body), = d.items()
        if name not in _KIND_NAMES:
            raise ValueError(f"unknown material kind {name!r}")
        kind = _KIND_NAMES[name]
        if kind == MaterialKind.MATTE:
            return MaterialData(
                kind=kind,
                color=_vec3(body["diffuse_color"]),
                param=float(body["diffuse_coefficient"]),
                ambient_color=_vec3(body.get("ambient_color", (1.0, 1.0, 1.0))),
            )
        if kind == MaterialKind.EMISSIVE:
            return MaterialData(
                kind=kind, color=_vec3(body["color"]), param=float(body["power"])
            )
        if kind == MaterialKind.REFLECTIVE:
            return MaterialData(
                kind=kind,
                color=_vec3(body["reflect_color"]),
                param=float(body["reflect_amount"]),
            )
        return MaterialData(
            kind=kind,
            color=_vec3(body["reflect_color"]),
            param=float(body["reflect_amount"]),
            exponent=float(body["reflect_exponent"]),
        )

    def to_dict(self) -> dict:
        name = _NAME_BY_KIND[self.kind]
        if self.kind == MaterialKind.MATTE:
            return {
                name: {
                    "diffuse_color": list(self.color),
                    "ambient_color": list(self.ambient_color),
                    "diffuse_coefficient": self.param,
                }
            }
        if self.kind == MaterialKind.EMISSIVE:
            return {name: {"color": list(self.color), "power": self.param}}
        body = {"reflect_color": list(self.color), "reflect_amount": self.param}
        if self.kind == MaterialKind.GLOSSY:
            body["reflect_exponent"] = self.exponent
        return {name: body}


@dataclass(frozen=True)
class SphereData:
    """Sphere shape record (reference: shapes.rs:15-23)."""

    center: Tuple[float, float, float]
    radius: float
    material: MaterialData
    invert: bool = False

    @staticmethod
    def from_dict(d: dict) -> "SphereData":
        return SphereData(
            center=_vec3(d["center"]),
            radius=float(d["radius"]),
            material=MaterialData.from_dict(d["material"]),
            invert=bool(d.get("invert", False)),
        )

    def to_dict(self) -> dict:
        return {
            "Sphere": {
                "center": list(self.center),
                "radius": self.radius,
                "material": self.material.to_dict(),
                "invert": self.invert,
            }
        }


@dataclass(frozen=True)
class PlaneData:
    """Infinite plane shape record (reference: shapes.rs:30-37)."""

    point: Tuple[float, float, float]
    normal: Tuple[float, float, float]
    material: MaterialData

    @staticmethod
    def from_dict(d: dict) -> "PlaneData":
        return PlaneData(
            point=_vec3(d["point"]),
            normal=_vec3(d["normal"]),
            material=MaterialData.from_dict(d["material"]),
        )

    def to_dict(self) -> dict:
        return {
            "Plane": {
                "point": list(self.point),
                "normal": list(self.normal),
                "material": self.material.to_dict(),
            }
        }


@dataclass(frozen=True)
class TriangleData:
    """Triangle shape record — a flux_tpu extension beyond the reference's
    sphere/plane schema (shapes.rs:68-74 has no mesh geometry). YAML form::

        - Triangle:
            v0: [x, y, z]
            v1: [x, y, z]
            v2: [x, y, z]
            material: {...}

    The geometric normal is ``normalize((v1-v0)×(v2-v0))`` (counter-
    clockwise winding) and is used exactly like an authored plane normal:
    double-sided intersection, no flip toward the ray — the same semantics
    the reference gives planes (shapes.rs:136-151). A ``Mesh`` variant
    (``vertices`` + ``faces`` index lists + one material) expands to
    triangles at load time; ``to_dict`` always writes ``Triangle`` entries,
    so the canonical wire form is flat triangles."""

    v0: Tuple[float, float, float]
    v1: Tuple[float, float, float]
    v2: Tuple[float, float, float]
    material: MaterialData

    @staticmethod
    def from_dict(d: dict) -> "TriangleData":
        return TriangleData(
            v0=_vec3(d["v0"]),
            v1=_vec3(d["v1"]),
            v2=_vec3(d["v2"]),
            material=MaterialData.from_dict(d["material"]),
        )

    def to_dict(self) -> dict:
        return {
            "Triangle": {
                "v0": list(self.v0),
                "v1": list(self.v1),
                "v2": list(self.v2),
                "material": self.material.to_dict(),
            }
        }


def _mesh_to_triangles(body: dict) -> List["TriangleData"]:
    """Expand a ``Mesh`` shape entry (shared vertex list + integer face
    triples + one material) into flat :class:`TriangleData` records."""
    mat = MaterialData.from_dict(body["material"])
    verts = [_vec3(v) for v in body["vertices"]]
    tris: List[TriangleData] = []
    for face in body["faces"]:
        i, j, k = (int(x) for x in face)
        n = len(verts)
        if not (0 <= i < n and 0 <= j < n and 0 <= k < n):
            raise ValueError(f"mesh face {face} indexes outside {n} vertices")
        tris.append(TriangleData(v0=verts[i], v1=verts[j], v2=verts[k], material=mat))
    return tris


@dataclass(frozen=True)
class CameraSettings:
    """Eye / look-at / up (reference: scene.rs:14-18)."""

    eye: Tuple[float, float, float]
    look_at: Tuple[float, float, float]
    up: Tuple[float, float, float]


@dataclass(frozen=True)
class CameraData:
    """Thin-lens parameters (reference: scene.rs:51-58)."""

    zoom_factor: float = 1.0
    view_plane_distance: float = 500.0
    focal_distance: float = 10.0
    lens_radius: float = 0.0


@dataclass(frozen=True)
class OutputSettings:
    """Image geometry (reference: scene.rs:60-66)."""

    image_width: int
    image_height: int
    pixel_size: float = 1.0


@dataclass(frozen=True)
class SceneData:
    """Pure-data scene description (reference: scene.rs:37-49).

    Fully serializable: cloned into every Job and shipped to network render
    nodes, exactly as the reference ships it over CBOR (manager.rs:157,
    workers.rs:159) — here via ``to_dict``/``from_dict`` + msgpack.
    """

    scene_name: str
    output_settings: OutputSettings
    background: Tuple[float, float, float]
    shapes: Tuple[object, ...]  # SphereData | PlaneData
    camera_settings: CameraSettings
    camera_data: CameraData

    @staticmethod
    def from_dict(doc: dict) -> "SceneData":
        shapes: List[object] = []
        for entry in doc["shapes"]:
            if len(entry) != 1:
                raise ValueError(f"shape must have exactly one variant: {entry}")
            (name, body), = entry.items()
            if name == "Sphere":
                shapes.append(SphereData.from_dict(body))
            elif name == "Plane":
                shapes.append(PlaneData.from_dict(body))
            elif name == "Triangle":
                shapes.append(TriangleData.from_dict(body))
            elif name == "Mesh":
                shapes.extend(_mesh_to_triangles(body))
            else:
                raise ValueError(f"unknown shape kind {name!r}")
        cs = doc["camera_settings"]
        cd = doc["camera_data"]
        os_ = doc["output_settings"]
        return SceneData(
            scene_name=str(doc["scene_name"]),
            output_settings=OutputSettings(
                image_width=int(os_["image_width"]),
                image_height=int(os_["image_height"]),
                pixel_size=float(os_["pixel_size"]),
            ),
            background=_vec3(doc["background"]),
            shapes=tuple(shapes),
            camera_settings=CameraSettings(
                eye=_vec3(cs["eye"]), look_at=_vec3(cs["look_at"]), up=_vec3(cs["up"])
            ),
            camera_data=CameraData(
                zoom_factor=float(cd["zoom_factor"]),
                view_plane_distance=float(cd["view_plane_distance"]),
                focal_distance=float(cd["focal_distance"]),
                lens_radius=float(cd["lens_radius"]),
            ),
        )

    def to_dict(self) -> dict:
        return {
            "scene_name": self.scene_name,
            "output_settings": {
                "image_width": self.output_settings.image_width,
                "image_height": self.output_settings.image_height,
                "pixel_size": self.output_settings.pixel_size,
            },
            "background": list(self.background),
            "shapes": [s.to_dict() for s in self.shapes],
            "camera_settings": {
                "eye": list(self.camera_settings.eye),
                "look_at": list(self.camera_settings.look_at),
                "up": list(self.camera_settings.up),
            },
            "camera_data": {
                "zoom_factor": self.camera_data.zoom_factor,
                "view_plane_distance": self.camera_data.view_plane_distance,
                "focal_distance": self.camera_data.focal_distance,
                "lens_radius": self.camera_data.lens_radius,
            },
        }


def loads_scene(text: str) -> SceneData:
    """Parse a scene from YAML text (reference loader: flux/src/main.rs:28-29).

    Unknown top-level keys are ignored, which is what makes the reference's
    anchor trick in demo2.yml (top-level ``mat1``/``mat2``/``mat3`` anchor
    definitions, scenes/demo2.yml:1-15) work unmodified.
    """
    return SceneData.from_dict(yaml.safe_load(text))


def load_scene(path: str) -> SceneData:
    with open(path, "r") as f:
        return loads_scene(f.read())


@dataclass(frozen=True)
class SceneArrays:
    """Device-resident scene: the TPU-native ``Scene`` (scene.rs:76-85).

    All ray lanes intersect these arrays by broadcasting; materials live in a
    flat table indexed by shape id (spheres first, then planes), replacing
    the reference's per-hit virtual dispatch (``&dyn Material``) with gathers.
    ``sphere_invert`` stores the reference's normal-flip flag as ±1
    (shapes.rs:183 ``invert_val``).
    """

    sphere_center: jnp.ndarray  # (Ns, 3) f32
    sphere_radius: jnp.ndarray  # (Ns,)   f32
    sphere_invert: jnp.ndarray  # (Ns,)   f32 (+1 / -1)
    plane_point: jnp.ndarray  # (Np, 3) f32
    plane_normal: jnp.ndarray  # (Np, 3) f32
    # Triangles (a flux_tpu extension; the reference has no mesh geometry).
    # Precomputed Möller–Trumbore form: v0 + the two edge vectors, plus the
    # unit geometric normal (counter-clockwise winding, plane semantics).
    tri_v0: jnp.ndarray = None  # (Nt, 3) f32
    tri_e1: jnp.ndarray = None  # (Nt, 3) f32  v1 - v0
    tri_e2: jnp.ndarray = None  # (Nt, 3) f32  v2 - v0
    tri_n: jnp.ndarray = None  # (Nt, 3) f32  unit normal
    mat_kind: jnp.ndarray = None  # (Ns+Np+Nt,) i32  (spheres, planes, triangles)
    mat_color: jnp.ndarray = None  # (Ns+Np+Nt, 3) f32
    mat_param: jnp.ndarray = None  # (Ns+Np+Nt,)  f32
    mat_exp: jnp.ndarray = None  # (Ns+Np+Nt,)  f32
    background: jnp.ndarray = None  # (3,) f32
    # Static (pytree-aux) flag: every ray direction in this scene is a unit
    # vector, so the sphere quadratic may take a == d·d == 1 exactly.
    # Camera rays are normalized (camera.py, matching trace.rs:50), BRDF
    # lobes emit unit wi from orthonormal frames (ops/brdf.py, matching
    # brdf.rs:26), and mirror reflection preserves length IFF the surface
    # normal is unit — sphere normals are unit by construction, so this
    # holds exactly when every authored plane normal is unit
    # (compile_scene checks). A non-unit plane normal falls back to the
    # reference's full a/inv_a quadratic (shapes.rs:177-187), which is
    # what keeps |wi| drift faithful there.
    unit_d: bool = True

    @property
    def num_spheres(self) -> int:
        return self.sphere_center.shape[0]

    @property
    def num_planes(self) -> int:
        return self.plane_point.shape[0]

    @property
    def num_triangles(self) -> int:
        # tri_v0 is None when the scene was built by a pre-triangle caller
        # (e.g. the megakernel's in-kernel reconstruction, which never sees
        # triangle scenes — Renderer routes those to the XLA backend).
        return 0 if self.tri_v0 is None else self.tri_v0.shape[0]


# Register as a pytree so SceneArrays flows through jit/shard_map untouched.
import jax.tree_util as _tree_util  # noqa: E402

_tree_util.register_dataclass(
    SceneArrays,
    data_fields=[
        f.name for f in dataclasses.fields(SceneArrays) if f.name != "unit_d"
    ],
    meta_fields=["unit_d"],
)


def compile_scene(sd: SceneData) -> SceneArrays:
    """Compile SceneData to device SoA (the ``Scene::from_data`` analog,
    scene.rs:128-154)."""
    spheres = [s for s in sd.shapes if isinstance(s, SphereData)]
    planes = [p for p in sd.shapes if isinstance(p, PlaneData)]
    tris = [t for t in sd.shapes if isinstance(t, TriangleData)]
    # Material table order: spheres, planes, triangles. Shape index i maps
    # to sphere i, plane i-Ns, or triangle i-Ns-Np; keeping triangles LAST
    # leaves the reference-era sphere/plane indexing untouched.
    mats = (
        [s.material for s in spheres]
        + [p.material for p in planes]
        + [t.material for t in tris]
    )

    def arr(data, shape, dtype=np.float32):
        a = np.asarray(data, dtype=dtype)
        return jnp.asarray(a.reshape(shape))

    ns, np_, nt = len(spheres), len(planes), len(tris)
    # Möller–Trumbore precompute (f64 host math, rounded once to f32).
    v0 = np.asarray([t.v0 for t in tris], np.float64).reshape(nt, 3)
    v1 = np.asarray([t.v1 for t in tris], np.float64).reshape(nt, 3)
    v2 = np.asarray([t.v2 for t in tris], np.float64).reshape(nt, 3)
    e1 = v1 - v0
    e2 = v2 - v0
    tn = np.cross(e1, e2)
    tn_len = np.linalg.norm(tn, axis=1, keepdims=True)
    if nt and (tn_len == 0.0).any():
        bad = int(np.argmax(tn_len[:, 0] == 0.0))
        raise ValueError(f"degenerate triangle (zero-area) at index {bad}")
    tn = tn / np.maximum(tn_len, 1e-300)
    # Unit-direction guarantee: see SceneArrays.unit_d. All stock scenes
    # author unit plane normals; a scene that doesn't keeps the reference's
    # exact a = d·d quadratic.
    unit_d = all(
        abs(float(np.linalg.norm(np.asarray(p.normal, np.float64))) - 1.0) < 1e-6
        for p in planes
    )
    return SceneArrays(
        unit_d=unit_d,
        sphere_center=arr([s.center for s in spheres], (ns, 3)),
        sphere_radius=arr([s.radius for s in spheres], (ns,)),
        sphere_invert=arr([-1.0 if s.invert else 1.0 for s in spheres], (ns,)),
        plane_point=arr([p.point for p in planes], (np_, 3)),
        plane_normal=arr([p.normal for p in planes], (np_, 3)),
        tri_v0=arr(v0, (nt, 3)),
        tri_e1=arr(e1, (nt, 3)),
        tri_e2=arr(e2, (nt, 3)),
        tri_n=arr(tn, (nt, 3)),
        mat_kind=arr([m.kind for m in mats], (ns + np_ + nt,), np.int32),
        mat_color=arr([m.color for m in mats], (ns + np_ + nt, 3)),
        mat_param=arr([m.param for m in mats], (ns + np_ + nt,)),
        mat_exp=arr([m.exponent for m in mats], (ns + np_ + nt,)),
        background=arr(sd.background, (3,)),
    )
