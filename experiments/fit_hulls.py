"""Fit decimated convex hulls of the reference Panda collision meshes.

Produces assets/panda_hulls.npz: per collision link, a <=MAX_VERTS vertex
table (collision-frame local coordinates, same frames as the capsule fits
in models/specs._PANDA_CAPS) whose convex hull inner-approximates the mesh
hull with a certified support error — the geometry consumed by the exact
GJK collision mode (ops/gjk.py, sim/collision.robot_obstacle_distances_hull).

Decimation is greedy support-error selection: starting from the 6 axis
extremes, repeatedly add the hull vertex that most reduces the worst-case
support underestimate  max_d [h_full(d) - h_subset(d)]  over a fixed set of
sampled directions. The chosen subset is a SUBSET of true hull vertices, so
the decimated hull is contained in the mesh hull: GJK distances can only
OVERestimate clearance, by at most the reported support error (sub-mm for
every Panda link at 32 vertices).

Reference geometry: /root/reference/urdf/franka_panda/meshes/collision
(the meshes PyBullet's GJK queries in simulation.py:462-484).

Usage: python experiments/fit_hulls.py [--max-verts 32] [--dirs 2048]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from collision_mesh_error import MESH_OF_LINK, REF_MESHES, load_obj


def fibonacci_directions(n: int) -> np.ndarray:
    """n roughly-uniform unit directions (spherical Fibonacci lattice)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(phi)], axis=-1)


def decimate_hull(verts: np.ndarray, max_verts: int, dirs: np.ndarray):
    """Greedy support-preserving subset of hull vertices.

    Returns (subset (M, 3), support_error) with M <= max_verts and
    support_error = max over dirs of the support underestimate (meters).
    """
    from scipy.spatial import ConvexHull

    hull = ConvexHull(verts)
    hv = verts[hull.vertices]                      # (H, 3) true hull vertices
    dots = hv @ dirs.T                             # (H, D)
    h_full = dots.max(axis=0)                      # (D,)

    chosen = set()
    for k in range(3):                             # 6 axis extremes
        chosen.add(int(np.argmax(hv[:, k])))
        chosen.add(int(np.argmin(hv[:, k])))
    idx = sorted(chosen)
    h_sub = dots[idx].max(axis=0)
    while len(idx) < min(max_verts, len(hv)):
        gap = h_full - h_sub                       # (D,) >= 0
        d_worst = int(np.argmax(gap))
        if gap[d_worst] <= 1e-5:                   # 0.01 mm: done
            break
        # the vertex that best fixes the worst direction
        cand = int(np.argmax(dots[:, d_worst]))
        if cand in chosen:                         # numerical tie; pick the
            order = np.argsort(-dots[:, d_worst])  # next best uncovered
            cand = next(int(c) for c in order if int(c) not in chosen)
        chosen.add(cand)
        idx = sorted(chosen)
        h_sub = np.maximum(h_sub, dots[cand])
    return hv[idx], float((h_full - h_sub).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-verts", type=int, default=96)
    ap.add_argument("--dirs", type=int, default=2048)
    args = ap.parse_args()

    dirs = fibonacci_directions(args.dirs)
    out = {}
    report = {}
    for link, (fname, yaw) in MESH_OF_LINK.items():
        verts, _ = load_obj(os.path.join(REF_MESHES, fname))
        if yaw:
            cz, sz = np.cos(yaw), np.sin(yaw)
            R = np.asarray([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            verts = verts @ R.T
        sub, err = decimate_hull(verts, args.max_verts, dirs)
        out[link] = sub.astype(np.float32)
        report[link] = dict(mesh_verts=int(verts.shape[0]),
                            hull_verts=int(sub.shape[0]),
                            support_error_mm=round(err * 1e3, 3))
        print(f"{link:20s} mesh {verts.shape[0]:5d} -> hull {sub.shape[0]:3d} "
              f"verts, support err {err * 1e3:.3f} mm")

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
    path = os.path.join(root, "assets", "panda_hulls.npz")
    np.savez_compressed(path, **out)
    with open(os.path.join(root, "reports", "hull_fit.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
