"""Fit tight multi-capsule approximations to the Panda collision meshes.

VERDICT r1 #3: the hand-tuned single capsules in models/specs._PANDA_CAPS
deviate from the reference collision meshes by up to ~7-9 cm. This fitter
produces K capsules per link (K chosen per link) minimizing an asymmetric
soft-Hausdorff loss over densely sampled mesh surface points:

    dev(x)  = min_k ( |x - seg_k| - r_k )      signed; >0 outside all capsules
    loss    = w_out * softmax+(dev) + w_in * softmax+(-dev)

protrusion (mesh outside capsules => obstacle-distance OVERestimates) is
weighted harder than padding (conservative). Initialization: k-means on
surface points + PCA axis per cluster; refinement: Adam on (p0, p1, log r).

Prints a _PANDA_CAPS table for models/specs.py and per-link fit stats.
Requires /root/reference (meshes). Usage:
    python experiments/fit_capsules.py [--k-max 3] [--steps 600]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from collision_mesh_error import (MESH_OF_LINK, REF_MESHES, load_obj,
                                  surface_samples)


def kmeans(pts, k, iters=30, seed=0):
    rng = np.random.default_rng(seed)
    centers = pts[rng.choice(len(pts), k, replace=False)]
    for _ in range(iters):
        d = np.linalg.norm(pts[:, None] - centers[None], axis=-1)
        lab = d.argmin(1)
        for j in range(k):
            sel = pts[lab == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return lab, centers


def init_capsules(pts, k, seed=0):
    lab, _ = kmeans(pts, k, seed=seed)
    caps = []
    for j in range(k):
        sel = pts[lab == j]
        if len(sel) < 4:
            sel = pts
        c = sel.mean(0)
        u, s, vt = np.linalg.svd(sel - c, full_matrices=False)
        axis = vt[0]
        t = (sel - c) @ axis
        r0 = np.linalg.norm((sel - c) - t[:, None] * axis, axis=-1).mean()
        lo, hi = np.quantile(t, 0.05), np.quantile(t, 0.95)
        caps.append(np.concatenate([c + lo * axis, c + hi * axis,
                                    [max(r0, 1e-3)]]))
    return np.stack(caps)  # (k, 7): p0 (3), p1 (3), r (1)


def hull_planes(pts):
    """(A, b) with A x <= b inside the convex hull of pts."""
    from scipy.spatial import ConvexHull
    hull = ConvexHull(pts)
    eq = hull.equations                   # (F, 4): n·x + d <= 0 inside
    return eq[:, :3], -eq[:, 3]


def fit_link(pts, k, steps=600, w_out=4.0, w_in=1.0, w_bulge=4.0,
             tau=0.003, seed=0):
    """Fit k capsules. Loss terms (softmax over samples):
      * mesh point protruding OUTSIDE all capsules (w_out),
      * mesh point deep INSIDE a capsule (w_in, mild),
      * capsule-surface sample OUTSIDE the mesh convex hull (w_bulge) —
        without this, a capsule can overshoot past the mesh end with zero
        gradient: mesh->capsule distances never see overhang volume.
    """
    import jax
    import jax.numpy as jnp
    import optax

    P = jnp.asarray(pts, jnp.float32)
    A_np, b_np = hull_planes(pts)
    A = jnp.asarray(A_np, jnp.float32)
    b = jnp.asarray(b_np, jnp.float32)
    x0 = init_capsules(pts, k, seed=seed)
    params = dict(p0=jnp.asarray(x0[:, 0:3], jnp.float32),
                  p1=jnp.asarray(x0[:, 3:6], jnp.float32),
                  logr=jnp.log(jnp.asarray(x0[:, 6], jnp.float32)))

    def signed_dev(prm):
        p0, p1 = prm["p0"], prm["p1"]                   # (k, 3)
        r = jnp.exp(prm["logr"])                        # (k,)
        d = p1 - p0
        denom = jnp.maximum(jnp.sum(d * d, -1), 1e-12)  # (k,)
        t = jnp.clip(jnp.einsum("nkj,kj->nk", P[:, None] - p0[None], d)
                     / denom, 0.0, 1.0)                 # (N, k)
        closest = p0[None] + t[..., None] * d[None]     # (N, k, 3)
        dist = jnp.linalg.norm(P[:, None] - closest, axis=-1) - r[None]
        return jnp.min(dist, axis=1)                    # (N,) signed

    def capsule_surface(prm, n_t=9, n_c=8):
        """Sample points on every capsule surface (incl. end caps)."""
        p0, p1 = prm["p0"], prm["p1"]
        r = jnp.exp(prm["logr"])
        d = p1 - p0
        axis = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                               1e-9)
        helper = jnp.where(jnp.abs(axis[:, :1]) < 0.9,
                           jnp.asarray([1.0, 0.0, 0.0]),
                           jnp.asarray([0.0, 1.0, 0.0]))
        u = jnp.cross(axis, helper)
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-9)
        v = jnp.cross(axis, u)
        ts = jnp.linspace(0.0, 1.0, n_t)                       # (T,)
        ang = jnp.linspace(0.0, 2 * np.pi, n_c, endpoint=False)
        ring = (jnp.cos(ang)[:, None, None] * u[None]
                + jnp.sin(ang)[:, None, None] * v[None])       # (C, k, 3)
        seg = p0[None] + ts[:, None, None] * d[None]           # (T, k, 3)
        side = seg[:, None] + r[None, None, :, None] * ring[None]  # (T,C,k,3)
        tips = jnp.stack([p0 - r[:, None] * axis, p1 + r[:, None] * axis])
        return jnp.concatenate([side.reshape(-1, 3), tips.reshape(-1, 3)])

    def loss(prm):
        dev = signed_dev(prm)
        out = tau * jax.nn.logsumexp(jnp.maximum(dev, 0.0) / tau)
        inside = tau * jax.nn.logsumexp(jnp.maximum(-dev, 0.0) / tau)
        S = capsule_surface(prm)                               # (M, 3)
        # distance outside the hull: max over planes of (A x - b), clamped
        plane = jnp.max(S @ A.T - b[None], axis=-1)            # (M,)
        bulge = tau * jax.nn.logsumexp(jnp.maximum(plane, 0.0) / tau)
        return w_out * out + w_in * inside + w_bulge * bulge

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(prm, st):
        v, g = jax.value_and_grad(loss)(prm)
        up, st = opt.update(g, st)
        return optax.apply_updates(prm, up), st, v

    for i in range(steps):
        params, state, v = step(params, state)
    dev = np.asarray(signed_dev(params))
    S = np.asarray(capsule_surface(params))
    bulge = np.maximum(S @ A_np.T - b_np[None], 0.0).max()
    caps = np.concatenate([np.asarray(params["p0"]), np.asarray(params["p1"]),
                           np.exp(np.asarray(params["logr"]))[:, None]], -1)
    return caps, dev, bulge


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k-max", type=int, default=3)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--target-mm", type=float, default=10.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    print("_PANDA_CAPS = {")
    stats = []
    for link, (fname, yaw) in MESH_OF_LINK.items():
        verts, faces = load_obj(os.path.join(REF_MESHES, fname))
        if yaw:
            cz, sz = np.cos(yaw), np.sin(yaw)
            R = np.asarray([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            verts = verts @ R.T
        pts = surface_samples(verts, faces)
        best = None
        for k in range(1, args.k_max + 1):
            caps, dev, bulge = fit_link(pts, k, steps=args.steps)
            score = (dev.max(), bulge)      # protrusion + capsule overhang
            if best is None or max(score) < max(best[2]):
                best = (k, caps, score, dev)
            if max(score) * 1000 < args.target_mm:
                break
        k, caps, (pro, bulge), dev = best
        stats.append((link, k, pro * 1000, bulge * 1000,
                      np.abs(dev).mean() * 1000))
        entries = ",\n        ".join(
            f'CollisionPrimitive("capsule", '
            f'({c[0]:.4f}, {c[1]:.4f}, {c[2]:.4f}), '
            f'({c[3]:.4f}, {c[4]:.4f}, {c[5]:.4f}), {c[6]:.4f})'
            for c in caps)
        print(f'    "{link}": (\n        {entries},\n    ),')
    print("}")
    print("\n# link  K  protrude_mm  bulge_mm  mean|dev|_mm")
    for link, k, pro, bulge, mean in stats:
        print(f"# {link:18s} {k}  {pro:8.1f} {bulge:8.1f} {mean:8.1f}")


if __name__ == "__main__":
    main()
