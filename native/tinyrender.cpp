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

struct Scene {
  const Capsule* caps;
  int n;
  const ConvexPrim* hulls;
  int n_hulls;
};

// sphere-traced scene distance; id = argmin primitive (-1 for ground
// plane; >= n: hull index id - n)
static inline float scene_sd(const Scene& s, Vec3 p, int* id) {
  float best = p.z;  // ground plane z = 0
  *id = -1;
  for (int i = 0; i < s.n; ++i) {
    float d = sd_capsule(p, s.caps[i]);
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
      if (march(scene, eye, rd, 30.0f, &t, &id)) {
        Vec3 p = eye + t * rd;
        Vec3 nrm = scene_normal(scene, p, id);
        Vec3 base;
        if (id < 0) {  // checkered ground
          int cx = (int)std::floor(p.x * 2.0f), cy = (int)std::floor(p.y * 2.0f);
          float c = ((cx + cy) & 1) ? 0.82f : 0.9f;
          base = {c, c, c};
        } else if (id >= scene.n) {
          base = scene.hulls[id - scene.n].color;
        } else {
          base = scene.caps[id].color;
        }
        float diff = std::max(0.0f, dot(nrm, light));
        // hard shadow
        float ts;
        int ids;
        Vec3 sp = p + 2e-3f * nrm;
        if (march(scene, sp, light, 10.0f, &ts, &ids)) diff *= 0.35f;
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

}  // extern "C"
