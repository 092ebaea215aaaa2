"""Generate ``scenes/demo5.yml`` — the Cornell-box showcase.

A classic Cornell box built entirely from triangle meshes (compact ``Mesh``
YAML blocks): five matte walls, a warm emissive ceiling QUAD (two
triangles — the triangle-light NEE showcase, sampled in-kernel since
round 3), a glossy tall box and a matte short box, both rotated about y.
Best rendered with ``--nee`` (reference transport) or ``--nee --physical``
(glossy MIS picks up the light in the tall box's highlights).

Writing the scene through this generator (rather than by hand) keeps the
windings provably correct: wall quads are wound so their normals face a
given interior point, box faces so theirs point outward — the shading
hemisphere and the one-sided emissive rule both follow the authored
winding (ops/shade.py, materials.rs:44-49).
"""

import os

import numpy as np
import yaml


def _face_normal(verts, f):
    a, b, c = (np.asarray(verts[i], float) for i in f)
    return np.cross(b - a, c - a)


def matte(color):
    return {"Matte": {"diffuse_color": list(color),
                      "ambient_color": [1.0, 1.0, 1.0],
                      "diffuse_coefficient": 1.0}}


def quad_mesh(p0, p1, p2, p3, material, toward):
    """Quad as a Mesh dict, wound so the normal faces ``toward``."""
    verts = [[float(c) for c in p] for p in (p0, p1, p2, p3)]
    faces = [[0, 1, 2], [0, 2, 3]]
    n = _face_normal(verts, faces[0])
    ctr = np.mean(np.asarray(verts), axis=0)
    if float(np.dot(n, np.asarray(toward, float) - ctr)) < 0.0:
        faces = [[0, 2, 1], [0, 3, 2]]
    return {"Mesh": {"vertices": verts, "faces": faces, "material": material}}


def box_mesh(cx, cz, w, h, d, angle_deg, material):
    """w×h×d box sitting on the floor at (cx, 0, cz), rotated about y.
    Faces wound outward (verified below against the box center)."""
    hw, hd = w / 2.0, d / 2.0
    local = np.array(
        [
            (-hw, 0, -hd), (hw, 0, -hd), (hw, 0, hd), (-hw, 0, hd),
            (-hw, h, -hd), (hw, h, -hd), (hw, h, hd), (-hw, h, hd),
        ],
        float,
    )
    faces = [
        [4, 6, 5], [4, 7, 6],  # top  (+y)
        [0, 1, 2], [0, 2, 3],  # bottom (−y)
        [3, 2, 6], [3, 6, 7],  # front (+z)
        [1, 0, 4], [1, 4, 5],  # back (−z)
        [2, 1, 5], [2, 5, 6],  # right (+x)
        [0, 3, 7], [0, 7, 4],  # left (−x)
    ]
    ctr = np.array([0.0, h / 2.0, 0.0])
    for f in faces:
        fc = local[f].mean(axis=0)
        assert float(np.dot(_face_normal(local, f), fc - ctr)) > 0.0, f
    a = np.deg2rad(angle_deg)
    rot = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    verts = (local @ rot.T + np.array([cx, 0.0, cz]))
    return {"Mesh": {"vertices": [[float(c) for c in v] for v in verts],
                     "faces": faces, "material": material}}


def build(light_power=22.0, size=512):
    inside = (0.0, 1.0, 0.0)
    white = (0.73, 0.73, 0.73)
    shapes = [
        # floor / ceiling / back / left(red) / right(green)
        quad_mesh((-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1),
                  matte(white), inside),
        quad_mesh((-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1),
                  matte(white), inside),
        quad_mesh((-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1),
                  matte(white), inside),
        quad_mesh((-1, 0, -1), (-1, 0, 1), (-1, 2, 1), (-1, 2, -1),
                  matte((0.65, 0.05, 0.05)), inside),
        quad_mesh((1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1),
                  matte((0.12, 0.45, 0.15)), inside),
        # ceiling light: warm quad a hair below the ceiling, emitting DOWN
        # (one-sided — the winding faces the floor).
        quad_mesh((-0.4, 1.998, -0.4), (0.4, 1.998, -0.4),
                  (0.4, 1.998, 0.4), (-0.4, 1.998, 0.4),
                  {"Emissive": {"color": [1.0, 0.85, 0.66],
                                "power": float(light_power)}},
                  (0.0, 0.0, 0.0)),
        # tall and short boxes (classic matte-white layout, rotated; a
        # glossy tall box just mirrors the OPEN front face — black — which
        # is exactly why the canonical scene keeps both matte).
        box_mesh(-0.38, -0.32, 0.6, 1.2, 0.6, 17.0, matte(white)),
        box_mesh(0.42, 0.35, 0.6, 0.6, 0.6, -18.0, matte(white)),
    ]
    return {
        "scene_name": "demo5",
        "output_settings": {"image_width": size, "image_height": size,
                            "pixel_size": 1.0},
        "background": [0.0, 0.0, 0.0],
        "shapes": shapes,
        "camera_settings": {"eye": [0.0, 1.0, 3.6], "look_at": [0.0, 1.0, 0.0],
                            "up": [0.0, 1.0, 0.0]},
        "camera_data": {"zoom_factor": 1.0, "view_plane_distance": 640.0,
                        "focal_distance": 3.6, "lens_radius": 0.0},
    }


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "scenes", "demo5.yml")
    doc = build()
    with open(out, "w") as f:
        f.write("# Cornell-box showcase: triangle meshes + a triangle area "
                "light (NEE in-kernel).\n# Generated by tools/cornell.py — "
                "regenerate rather than hand-editing windings.\n")
        yaml.safe_dump(doc, f, sort_keys=False)
    print("wrote", out)


if __name__ == "__main__":
    main()
