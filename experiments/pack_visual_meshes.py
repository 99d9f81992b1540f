"""Pack the reference's OBJ visual meshes into a compact NPZ asset.

The reference renders OBJ visual meshes through PyBullet's GUI / TinyRenderer
(reference simulation.py:296-300; urdf/franka_panda/meshes/visual/*.obj).
rmp_tpu's native ray tracer draws the analytic capsule or exact-hull link
geometry by default; this packer produces `assets/{robot}_visual.npz` so it
can also draw the actual visual triangle meshes (BVH path in
native/tinyrender.cpp, `--geometry visual` in make_gifs/viewer).

Per URDF link with a <visual><mesh>: vertices in link-local coordinates with
the <visual><origin> baked in (float16 — ~0.1 mm quantization at arm scale)
and int32 triangle indices, savez_compressed. Vertex normals are recomputed
area-weighted at load time (models/meshes.py), so they are not stored.
`_base_links` lists root links (no parent joint): the single-robot model has
no frame for its base, so the loader poses those at the identity.

Run where /root/reference exists:
    python experiments/pack_visual_meshes.py
"""
from __future__ import annotations

import argparse
import os
from xml.etree import ElementTree

import numpy as np

REF_URDF = "/root/reference/urdf/franka_panda/panda.urdf"


def parse_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader: v/f records only (normals are recomputed at
    load), polygons fan-triangulated, 1-based and negative indices."""
    verts, tris = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    tris.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float64),
            np.asarray(tris, np.int32).reshape(-1, 3))


def _rpy_matrix(rpy) -> np.ndarray:
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = (np.cos(r), np.sin(r), np.cos(p), np.sin(p),
                              np.cos(y), np.sin(y))
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--urdf", default=REF_URDF)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), os.pardir, "assets", "panda_visual.npz"))
    args = ap.parse_args()

    root = ElementTree.parse(args.urdf).getroot()
    urdf_dir = os.path.dirname(os.path.abspath(args.urdf))
    child_links = {j.find("child").get("link")
                   for j in root.findall("joint")}

    data: dict[str, np.ndarray] = {}
    base_links = []
    total_v = total_t = 0
    for link in root.findall("link"):
        name = link.get("name")
        vis = link.find("visual")
        if vis is None:
            continue
        mesh = vis.find("geometry/mesh")
        if mesh is None:
            continue
        rel = mesh.get("filename").replace("package://", "")
        verts, tris = parse_obj(os.path.join(urdf_dir, rel))
        origin = vis.find("origin")
        if origin is not None:
            xyz = np.array([float(x) for x in
                            origin.get("xyz", "0 0 0").split()])
            rpy = [float(x) for x in origin.get("rpy", "0 0 0").split()]
            verts = verts @ _rpy_matrix(rpy).T + xyz
        data[f"{name}_verts"] = verts.astype(np.float16)
        data[f"{name}_tris"] = tris
        if name not in child_links:
            base_links.append(name)
        total_v += len(verts)
        total_t += len(tris)
        print(f"{name:24s} {len(verts):6d} verts {len(tris):6d} tris "
              f"({rel})")
    data["_base_links"] = np.asarray(base_links)

    np.savez_compressed(args.out, **data)
    print(f"\n{len(base_links)} base link(s): {base_links}")
    print(f"total {total_v} verts / {total_t} tris -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
