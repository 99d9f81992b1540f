// Native software renderer for scene observation frames.
//
// The reference's visual observability subsystem renders through PyBullet's
// C++ TinyRenderer (reference simulation.py:296-300, p.getCameraImage with
// ER_TINY_RENDERER). This is the rmp_tpu equivalent: a small analytic
// ray-tracer over the scene's capsule/sphere primitives (robot collision
// capsules, obstacles, goal marker) plus a checkered ground plane, with
// Lambertian shading and hard shadows. Exposed via a C ABI for ctypes
// (utils/native.py); frames feed the same GIF pipeline as the matplotlib
// fallback renderer.
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 operator*(float s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }
static inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float norm(Vec3 a) { return std::sqrt(dot(a, a)); }
static inline Vec3 normalize(Vec3 a) {
  float n = norm(a);
  return n > 1e-12f ? (1.0f / n) * a : Vec3{0, 0, 1};
}

// r < 0 tags a FLAT-capped cylinder of radius -r (internal convention with
// utils/native.py: the scene's cylinder obstacles — ObstacleSet.kinds —
// render with their true flat caps, as in the reference GUI, instead of
// the capsule's hemispherical bulge)
struct Capsule {
  Vec3 p0, p1;
  float r;
  Vec3 color;
};

// signed distance from point to capsule surface
static inline float sd_capsule(Vec3 p, const Capsule& c) {
  Vec3 pa = p - c.p0;
  Vec3 ba = c.p1 - c.p0;
  float bb = dot(ba, ba);
  float h = bb > 1e-12f ? std::clamp(dot(pa, ba) / bb, 0.0f, 1.0f) : 0.0f;
  Vec3 d = pa - h * ba;
  return norm(d) - c.r;
}

// exact signed distance to a flat-capped cylinder (axis p0->p1, radius r)
static inline float sd_cylinder(Vec3 p, const Capsule& c) {
  float r = -c.r;
  Vec3 ba = c.p1 - c.p0;
  Vec3 pa = p - c.p0;
  float baba = dot(ba, ba);
  if (baba < 1e-12f) return norm(pa) - r;
  float paba = dot(pa, ba);
  float x = norm(baba * pa - paba * ba) - r * baba;
  float y = std::fabs(paba - baba * 0.5f) - baba * 0.5f;
  float x2 = x * x;
  float y2 = y * y * baba;
  float d = (std::max(x, y) < 0.0f)
                ? -std::min(x2, y2)
                : ((x > 0.0f ? x2 : 0.0f) + (y > 0.0f ? y2 : 0.0f));
  return (d < 0.0f ? -1.0f : 1.0f) * std::sqrt(std::fabs(d)) / baba;
}

static inline float sd_prim(Vec3 p, const Capsule& c) {
  return c.r < 0.0f ? sd_cylinder(p, c) : sd_capsule(p, c);
}

// convex polytope as intersection of half-spaces n.x <= d: the signed
// "distance" max_i(n_i.p - d_i) is exact on faces/inside and a lower bound
// near edges/corners — safe (conservative) for sphere tracing. Used to
// render the EXACT mesh-hull collision geometry (models/hulls.py), the
// visual counterpart of the reference's OBJ meshes in the PyBullet GUI.
struct ConvexPrim {
  const float* planes;  // F x 4 [nx ny nz d]
  int n_planes;
  Vec3 color;
};

static inline float sd_convex(Vec3 p, const ConvexPrim& c, int* face) {
  float best = -1e30f;
  *face = 0;
  for (int i = 0; i < c.n_planes; ++i) {
    const float* pl = c.planes + 4 * i;
    float d = pl[0] * p.x + pl[1] * p.y + pl[2] * p.z - pl[3];
    if (d > best) {
      best = d;
      *face = i;
    }
  }
  return best;
}

// ---------------------------------------------------------------------------
// Triangle meshes (the reference's OBJ visual meshes, PyBullet GUI
// counterpart). Meshes are ray-traced through a per-mesh median-split BVH
// built once per frame (~110k triangles build in a few ms); instances are
// rigid poses of library meshes, so rays are transformed into mesh-local
// coordinates (t parameter preserved under the orthonormal transform).

struct BvhNode {
  Vec3 lo, hi;
  int left;   // internal: child pair (left, left+1); leaf: -1
  int start, count;  // leaf triangle range into tri_order
};

struct Mesh {
  const float* verts;    // V x 3 mesh-local
  const float* normals;  // V x 3 unit vertex normals
  const int32_t* tris;   // T x 3 vertex indices (mesh-local)
  int n_tris;
  std::vector<BvhNode> nodes;
  std::vector<int> tri_order;
};

struct MeshInstance {
  int mesh;
  Vec3 r0, r1, r2;  // rows of world-from-local rotation
  Vec3 t;
  Vec3 color;
  Vec3 lo, hi;      // world-space AABB (instance early-out)
};

static inline Vec3 tri_vert(const Mesh& m, int tri, int corner) {
  const float* v = m.verts + 3 * m.tris[3 * tri + corner];
  return {v[0], v[1], v[2]};
}

static void bvh_build(Mesh& m) {
  int n = m.n_tris;
  m.tri_order.resize(n);
  std::vector<Vec3> centroid(n);
  for (int i = 0; i < n; ++i) {
    m.tri_order[i] = i;
    Vec3 a = tri_vert(m, i, 0), b = tri_vert(m, i, 1), c = tri_vert(m, i, 2);
    centroid[i] = (1.0f / 3.0f) * (a + b + c);
  }
  m.nodes.reserve(2 * n);
  // iterative build over (node, start, count) work items
  struct Item { int node, start, count; };
  std::vector<Item> todo;
  m.nodes.push_back({});
  todo.push_back({0, 0, n});
  while (!todo.empty()) {
    Item it = todo.back();
    todo.pop_back();
    Vec3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
    Vec3 clo = lo, chi = hi;
    for (int k = it.start; k < it.start + it.count; ++k) {
      int tri = m.tri_order[k];
      for (int c = 0; c < 3; ++c) {
        Vec3 v = tri_vert(m, tri, c);
        lo = {std::min(lo.x, v.x), std::min(lo.y, v.y), std::min(lo.z, v.z)};
        hi = {std::max(hi.x, v.x), std::max(hi.y, v.y), std::max(hi.z, v.z)};
      }
      Vec3 ce = centroid[tri];
      clo = {std::min(clo.x, ce.x), std::min(clo.y, ce.y), std::min(clo.z, ce.z)};
      chi = {std::max(chi.x, ce.x), std::max(chi.y, ce.y), std::max(chi.z, ce.z)};
    }
    BvhNode& node = m.nodes[it.node];
    node.lo = lo;
    node.hi = hi;
    Vec3 ext = chi - clo;
    float max_ext = std::max({ext.x, ext.y, ext.z});
    if (it.count <= 4 || max_ext < 1e-7f) {
      node.left = -1;
      node.start = it.start;
      node.count = it.count;
      continue;
    }
    int axis = ext.x == max_ext ? 0 : (ext.y == max_ext ? 1 : 2);
    auto key = [&](int tri) {
      return axis == 0 ? centroid[tri].x
                       : (axis == 1 ? centroid[tri].y : centroid[tri].z);
    };
    int mid = it.start + it.count / 2;
    std::nth_element(m.tri_order.begin() + it.start,
                     m.tri_order.begin() + mid,
                     m.tri_order.begin() + it.start + it.count,
                     [&](int a, int b) { return key(a) < key(b); });
    int left = (int)m.nodes.size();
    node.left = left;
    m.nodes.push_back({});
    m.nodes.push_back({});
    todo.push_back({left, it.start, mid - it.start});
    todo.push_back({left + 1, mid, it.start + it.count - mid});
  }
}

static inline bool aabb_hit(Vec3 lo, Vec3 hi, Vec3 ro, Vec3 inv_rd,
                            float tmax) {
  float t0 = (lo.x - ro.x) * inv_rd.x, t1 = (hi.x - ro.x) * inv_rd.x;
  float tn = std::min(t0, t1), tf = std::max(t0, t1);
  t0 = (lo.y - ro.y) * inv_rd.y;
  t1 = (hi.y - ro.y) * inv_rd.y;
  tn = std::max(tn, std::min(t0, t1));
  tf = std::min(tf, std::max(t0, t1));
  t0 = (lo.z - ro.z) * inv_rd.z;
  t1 = (hi.z - ro.z) * inv_rd.z;
  tn = std::max(tn, std::min(t0, t1));
  tf = std::min(tf, std::max(t0, t1));
  return tf >= std::max(tn, 0.0f) && tn <= tmax;
}

// Moller-Trumbore; updates (t, u, v, tri) on a closer hit
static inline bool tri_hit(const Mesh& m, int tri, Vec3 ro, Vec3 rd,
                           float* t, float* u, float* v) {
  Vec3 a = tri_vert(m, tri, 0);
  Vec3 e1 = tri_vert(m, tri, 1) - a;
  Vec3 e2 = tri_vert(m, tri, 2) - a;
  Vec3 p = cross(rd, e2);
  float det = dot(e1, p);
  if (std::fabs(det) < 1e-12f) return false;
  float inv = 1.0f / det;
  Vec3 s = ro - a;
  float uu = dot(s, p) * inv;
  if (uu < 0.0f || uu > 1.0f) return false;
  Vec3 q = cross(s, e1);
  float vv = dot(rd, q) * inv;
  if (vv < 0.0f || uu + vv > 1.0f) return false;
  float tt = dot(e2, q) * inv;
  if (tt <= 1e-4f || tt >= *t) return false;
  *t = tt;
  *u = uu;
  *v = vv;
  return true;
}

// nearest triangle hit in ONE mesh (local-frame ray); returns tri or -1
static inline int bvh_trace(const Mesh& m, Vec3 ro, Vec3 rd, float* t,
                            float* u, float* v, bool any_hit) {
  Vec3 inv_rd{1.0f / (rd.x != 0.0f ? rd.x : 1e-30f),
              1.0f / (rd.y != 0.0f ? rd.y : 1e-30f),
              1.0f / (rd.z != 0.0f ? rd.z : 1e-30f)};
  int stack[64];
  int sp = 0;
  stack[sp++] = 0;
  int best = -1;
  while (sp) {
    const BvhNode& node = m.nodes[stack[--sp]];
    if (!aabb_hit(node.lo, node.hi, ro, inv_rd, *t)) continue;
    if (node.left < 0) {
      for (int k = node.start; k < node.start + node.count; ++k) {
        int tri = m.tri_order[k];
        if (tri_hit(m, tri, ro, rd, t, u, v)) {
          best = tri;
          if (any_hit) return best;
        }
      }
    } else if (sp + 2 <= 64) {
      stack[sp++] = node.left;
      stack[sp++] = node.left + 1;
    }
  }
  return best;
}

struct MeshHit {
  float t, u, v;
  int inst, tri;
};

// nearest mesh hit across all instances (world-frame ray)
static inline bool trace_meshes(const std::vector<Mesh>& meshes,
                                const std::vector<MeshInstance>& insts,
                                Vec3 ro, Vec3 rd, float tmax, MeshHit* hit,
                                bool any_hit) {
  Vec3 inv_rd{1.0f / (rd.x != 0.0f ? rd.x : 1e-30f),
              1.0f / (rd.y != 0.0f ? rd.y : 1e-30f),
              1.0f / (rd.z != 0.0f ? rd.z : 1e-30f)};
  hit->t = tmax;
  hit->inst = -1;
  for (int i = 0; i < (int)insts.size(); ++i) {
    const MeshInstance& mi = insts[i];
    if (!aabb_hit(mi.lo, mi.hi, ro, inv_rd, hit->t)) continue;
    // local ray: ro' = R^T (ro - t), rd' = R^T rd
    // R^T v = (col_i . v); r0..r2 are the ROWS of world-from-local R
    Vec3 c0{mi.r0.x, mi.r1.x, mi.r2.x};
    Vec3 c1{mi.r0.y, mi.r1.y, mi.r2.y};
    Vec3 c2{mi.r0.z, mi.r1.z, mi.r2.z};
    Vec3 d = ro - mi.t;
    Vec3 lro{dot(c0, d), dot(c1, d), dot(c2, d)};
    Vec3 lrd{dot(c0, rd), dot(c1, rd), dot(c2, rd)};
    float u, vv;
    int tri = bvh_trace(meshes[mi.mesh], lro, lrd, &hit->t, &u, &vv, any_hit);
    if (tri >= 0) {
      hit->inst = i;
      hit->tri = tri;
      hit->u = u;
      hit->v = vv;
      if (any_hit) return true;
    }
  }
  return hit->inst >= 0;
}

// interpolated world-space shading normal at a mesh hit
static inline Vec3 mesh_normal(const std::vector<Mesh>& meshes,
                               const std::vector<MeshInstance>& insts,
                               const MeshHit& h, Vec3 rd) {
  const MeshInstance& mi = insts[h.inst];
  const Mesh& m = meshes[mi.mesh];
  float w = 1.0f - h.u - h.v;
  Vec3 n{0, 0, 0};
  float coef[3] = {w, h.u, h.v};
  for (int c = 0; c < 3; ++c) {
    const float* vn = m.normals + 3 * m.tris[3 * h.tri + c];
    n = n + coef[c] * Vec3{vn[0], vn[1], vn[2]};
  }
  // local -> world: R n (rows r0..r2 form R)
  Vec3 nw{mi.r0.x * n.x + mi.r0.y * n.y + mi.r0.z * n.z,
          mi.r1.x * n.x + mi.r1.y * n.y + mi.r1.z * n.z,
          mi.r2.x * n.x + mi.r2.y * n.y + mi.r2.z * n.z};
  nw = normalize(nw);
  if (dot(nw, rd) > 0.0f) nw = -1.0f * nw;  // two-sided shading
  return nw;
}

struct Scene {
  const Capsule* caps;
  int n;
  const ConvexPrim* hulls;
  int n_hulls;
  const std::vector<Mesh>* meshes = nullptr;
  const std::vector<MeshInstance>* insts = nullptr;
};

// sphere-traced scene distance; id = argmin primitive (-1 for ground
// plane; >= n: hull index id - n)
static inline float scene_sd(const Scene& s, Vec3 p, int* id) {
  float best = p.z;  // ground plane z = 0
  *id = -1;
  for (int i = 0; i < s.n; ++i) {
    float d = sd_prim(p, s.caps[i]);
    if (d < best) {
      best = d;
      *id = i;
    }
  }
  for (int i = 0; i < s.n_hulls; ++i) {
    int face;
    float d = sd_convex(p, s.hulls[i], &face);
    if (d < best) {
      best = d;
      *id = s.n + i;
    }
  }
  return best;
}

// analytic surface normal of the hit primitive (id < 0: ground plane)
static inline Vec3 scene_normal(const Scene& s, Vec3 p, int id) {
  if (id < 0) return {0, 0, 1};
  if (id >= s.n) {
    const ConvexPrim& c = s.hulls[id - s.n];
    int face;
    sd_convex(p, c, &face);
    const float* pl = c.planes + 4 * face;
    return {pl[0], pl[1], pl[2]};
  }
  const Capsule& c = s.caps[id];
  if (c.r < 0.0f) {  // flat-capped cylinder: central-difference gradient
    const float e = 5e-4f;
    return normalize(
        {sd_cylinder(p + Vec3{e, 0, 0}, c) - sd_cylinder(p - Vec3{e, 0, 0}, c),
         sd_cylinder(p + Vec3{0, e, 0}, c) - sd_cylinder(p - Vec3{0, e, 0}, c),
         sd_cylinder(p + Vec3{0, 0, e}, c) - sd_cylinder(p - Vec3{0, 0, e}, c)});
  }
  Vec3 pa = p - c.p0;
  Vec3 ba = c.p1 - c.p0;
  float bb = dot(ba, ba);
  float h = bb > 1e-12f ? std::clamp(dot(pa, ba) / bb, 0.0f, 1.0f) : 0.0f;
  return normalize(pa - h * ba);
}

static inline bool march(const Scene& s, Vec3 ro, Vec3 rd, float max_t,
                         float* t_hit, int* id_hit) {
  float t = 0.0f;
  for (int i = 0; i < 64 && t < max_t; ++i) {
    Vec3 p = ro + t * rd;
    int id;
    float d = scene_sd(s, p, &id);
    if (d < 1e-3f) {
      *t_hit = t;
      *id_hit = id;
      return true;
    }
    t += std::max(d, 1e-3f);
  }
  return false;
}

static void render_scene_impl(const Scene& scene, const float* camera,
                              int width, int height, uint8_t* out) {
  Vec3 eye{camera[0], camera[1], camera[2]};
  Vec3 target{camera[3], camera[4], camera[5]};
  float fov = camera[6] * 3.14159265f / 180.0f;

  Vec3 fwd = normalize(target - eye);
  Vec3 right = normalize(cross(fwd, {0, 0, 1}));
  Vec3 up = cross(right, fwd);
  float plane = std::tan(0.5f * fov);

  Vec3 light = normalize({0.4f, -0.3f, 0.85f});
  Vec3 sky{0.93f, 0.95f, 0.98f};

#pragma omp parallel for schedule(dynamic, 4)
  for (int py = 0; py < height; ++py) {
    for (int px = 0; px < width; ++px) {
      float u = (2.0f * (px + 0.5f) / width - 1.0f) * plane * width / height;
      float v = (1.0f - 2.0f * (py + 0.5f) / height) * plane;
      Vec3 rd = normalize(fwd + u * right + v * up);

      Vec3 col = sky;
      float t;
      int id;
      bool hit_sdf = march(scene, eye, rd, 30.0f, &t, &id);
      MeshHit mh;
      bool hit_mesh =
          scene.insts != nullptr &&
          trace_meshes(*scene.meshes, *scene.insts, eye, rd,
                       hit_sdf ? t : 30.0f, &mh, false);
      if (hit_sdf || hit_mesh) {
        Vec3 nrm, base;
        if (hit_mesh) {  // trace_meshes only reports hits closer than t
          t = mh.t;
          nrm = mesh_normal(*scene.meshes, *scene.insts, mh, rd);
          base = (*scene.insts)[mh.inst].color;
        } else {
          Vec3 p = eye + t * rd;
          nrm = scene_normal(scene, p, id);
          if (id < 0) {  // checkered ground
            int cx = (int)std::floor(p.x * 2.0f),
                cy = (int)std::floor(p.y * 2.0f);
            float c = ((cx + cy) & 1) ? 0.82f : 0.9f;
            base = {c, c, c};
          } else if (id >= scene.n) {
            base = scene.hulls[id - scene.n].color;
          } else {
            base = scene.caps[id].color;
          }
        }
        Vec3 p = eye + t * rd;
        float diff = std::max(0.0f, dot(nrm, light));
        // hard shadow (SDF primitives + mesh occluders)
        float ts;
        int ids;
        MeshHit sh;
        Vec3 sp = p + 2e-3f * nrm;
        if (march(scene, sp, light, 10.0f, &ts, &ids) ||
            (scene.insts != nullptr &&
             trace_meshes(*scene.meshes, *scene.insts, sp, light, 10.0f,
                          &sh, true)))
          diff *= 0.35f;
        float amb = 0.35f;
        col = (amb + 0.65f * diff) * base;
        // distance fog toward sky
        float fog = std::min(1.0f, t / 25.0f);
        col = (1.0f - fog) * col + fog * sky;
      }
      uint8_t* px_out = out + 3 * (py * width + px);
      px_out[0] = (uint8_t)std::clamp(col.x * 255.0f, 0.0f, 255.0f);
      px_out[1] = (uint8_t)std::clamp(col.y * 255.0f, 0.0f, 255.0f);
      px_out[2] = (uint8_t)std::clamp(col.z * 255.0f, 0.0f, 255.0f);
    }
  }
}

static Capsule* build_caps(const float* capsules, int n) {
  Capsule* caps = new Capsule[n];
  for (int i = 0; i < n; ++i) {
    const float* c = capsules + 10 * i;
    caps[i] = {{c[0], c[1], c[2]}, {c[3], c[4], c[5]}, c[6], {c[7], c[8], c[9]}};
  }
  return caps;
}

}  // namespace

extern "C" {

// capsules: n x 10 floats [p0xyz, p1xyz, radius, rgb]
// camera:   [eye xyz, target xyz, fov_deg]
// out:      H x W x 3 uint8
void rmp_render_frame(const float* capsules, int n, const float* camera,
                      int width, int height, uint8_t* out) {
  Capsule* caps = build_caps(capsules, n);
  Scene scene{caps, n, nullptr, 0};
  render_scene_impl(scene, camera, width, height, out);
  delete[] caps;
}

// Capsules PLUS world-space convex hulls (the exact mesh-hull link
// geometry). planes: concatenated F_i x 4 half-space rows [n xyz, d]
// (inside: n.x <= d); counts: n_hulls plane counts; colors: n_hulls x 3.
void rmp_render_frame_hulls(const float* capsules, int n,
                            const float* planes, const int* counts,
                            const float* colors, int n_hulls,
                            const float* camera, int width, int height,
                            uint8_t* out) {
  Capsule* caps = build_caps(capsules, n);
  ConvexPrim* hulls = new ConvexPrim[n_hulls];
  const float* pl = planes;
  for (int i = 0; i < n_hulls; ++i) {
    hulls[i] = {pl, counts[i],
                {colors[3 * i], colors[3 * i + 1], colors[3 * i + 2]}};
    pl += 4 * counts[i];
  }
  Scene scene{caps, n, hulls, n_hulls};
  render_scene_impl(scene, camera, width, height, out);
  delete[] caps;
  delete[] hulls;
}

// feature probe: negative-radius capsule rows tag flat-capped cylinders
// (see Capsule); lets utils/native.py degrade to all-capsule rendering on
// a stale prebuilt library without the tag semantics
int rmp_has_cylinder_rows(void) { return 1; }

// Capsules PLUS rigid triangle-mesh instances — the visual counterpart of
// the reference's OBJ meshes in the PyBullet GUI (reference
// urdf/franka_panda/meshes/visual/*.obj via p.getCameraImage,
// simulation.py:296-300). Mesh library: concatenated verts/normals
// (sum_V x 3 float) and triangle vertex indices (sum_T x 3 int32, LOCAL to
// each mesh); v_off/t_off are (n_meshes + 1) prefix offsets. Instances:
// library index, 12-float pose [R row-major | t], RGB color.
void rmp_render_frame_meshes(const float* capsules, int n_caps,
                             const float* verts, const float* normals,
                             const int32_t* tris, const int32_t* v_off,
                             const int32_t* t_off, int n_meshes,
                             const int32_t* inst_mesh,
                             const float* inst_pose,
                             const float* inst_color, int n_inst,
                             const float* camera, int width, int height,
                             uint8_t* out) {
  std::vector<Mesh> meshes(n_meshes);
  for (int i = 0; i < n_meshes; ++i) {
    Mesh& m = meshes[i];
    m.verts = verts + 3 * v_off[i];
    m.normals = normals + 3 * v_off[i];
    m.tris = tris + 3 * t_off[i];
    m.n_tris = t_off[i + 1] - t_off[i];
    bvh_build(m);
  }
  std::vector<MeshInstance> insts(n_inst);
  for (int i = 0; i < n_inst; ++i) {
    const float* ps = inst_pose + 12 * i;
    MeshInstance& mi = insts[i];
    mi.mesh = inst_mesh[i];
    mi.r0 = {ps[0], ps[1], ps[2]};
    mi.r1 = {ps[3], ps[4], ps[5]};
    mi.r2 = {ps[6], ps[7], ps[8]};
    mi.t = {ps[9], ps[10], ps[11]};
    mi.color = {inst_color[3 * i], inst_color[3 * i + 1],
                inst_color[3 * i + 2]};
    // world AABB of the posed local box: center R c + t, extent |R| e
    const BvhNode& root = meshes[mi.mesh].nodes[0];
    Vec3 c = 0.5f * (root.lo + root.hi);
    Vec3 e = 0.5f * (root.hi - root.lo);
    Vec3 wc{dot(mi.r0, c) + mi.t.x, dot(mi.r1, c) + mi.t.y,
            dot(mi.r2, c) + mi.t.z};
    Vec3 we{std::fabs(ps[0]) * e.x + std::fabs(ps[1]) * e.y +
                std::fabs(ps[2]) * e.z,
            std::fabs(ps[3]) * e.x + std::fabs(ps[4]) * e.y +
                std::fabs(ps[5]) * e.z,
            std::fabs(ps[6]) * e.x + std::fabs(ps[7]) * e.y +
                std::fabs(ps[8]) * e.z};
    mi.lo = wc - we;
    mi.hi = wc + we;
  }
  Capsule* caps = build_caps(capsules, n_caps);
  Scene scene{caps, n_caps, nullptr, 0, &meshes, &insts};
  render_scene_impl(scene, camera, width, height, out);
  delete[] caps;
}

}  // extern "C"
