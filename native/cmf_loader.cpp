// Collision-mesh pipeline: .cmf parsing + SDF grid baking.
//
// Native counterpart of the reference's CollisionMeshFile
// (RocketSim/src/CollisionMeshFile/CollisionMeshFile.cpp) and the
// mesh-preprocessing half of RocketSim::Init (RocketSim.cpp:102-212).
// Instead of building bullet BVH shapes (pointer-chasing, useless on TPU),
// this bakes the triangle soup into a dense distance+direction grid that
// the JAX geometry layer samples with trilinear interpolation — a
// representation XLA can vectorize over thousands of arenas.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// .cmf layout (CollisionMeshFile::ReadFromStream):
//   int32 numTris, int32 numVertices,
//   numTris * { int32 v0, v1, v2 },
//   numVertices * { float x, y, z }

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <thread>
#include <algorithm>

namespace {

struct Mesh {
    std::vector<int32_t> tris;   // [T * 3]
    std::vector<float> verts;    // [V * 3]
    uint32_t hash = 0;
};

constexpr int MAX_VERT_OR_TRI_COUNT = 1000 * 1000;

// Same hash as CollisionMeshFile::UpdateHash (CollisionMeshFile.cpp:75-99):
// float vertex components are converted to uint32 *by value* and mixed.
uint32_t HashMesh(const Mesh& m) {
    const size_t numTris = m.tris.size() / 3;
    const size_t numVerts = m.verts.size() / 3;
    uint32_t hash = (uint32_t)(numVerts + numTris * numVerts);

    constexpr uint32_t HASH_VAL_MUELLER = 0x45D9F3B;
    constexpr uint32_t HASH_VAL_SHIFT = 0x9E3779B9;

    for (size_t t = 0; t < numTris; t++) {
        for (int i = 0; i < 3; i++) {
            const float* v = &m.verts[m.tris[t * 3 + i] * 3];
            for (int j = 0; j < 3; j++) {
                float f = v[j];
                // float->uint32 numeric conversion (negative saturates to 0
                // here; the reference relies on platform behavior)
                uint32_t curVal = f <= 0 ? 0u : (uint32_t)f;
                for (int k = 0; k < 2; k++)
                    curVal = ((curVal >> 16) ^ curVal) * HASH_VAL_MUELLER;
                curVal = (curVal >> 16) ^ curVal;
                hash ^= curVal + HASH_VAL_SHIFT + (hash << 6) + (hash >> 2);
            }
        }
    }
    return hash;
}

// Closest point on triangle (a,b,c) to p. Standard Ericson RTCD routine.
void ClosestPtTri(const float* p, const float* a, const float* b,
                  const float* c, float* out) {
    float ab[3], ac[3], ap[3];
    for (int i = 0; i < 3; i++) {
        ab[i] = b[i] - a[i];
        ac[i] = c[i] - a[i];
        ap[i] = p[i] - a[i];
    }
    auto dot = [](const float* x, const float* y) {
        return x[0] * y[0] + x[1] * y[1] + x[2] * y[2];
    };
    float d1 = dot(ab, ap), d2 = dot(ac, ap);
    if (d1 <= 0 && d2 <= 0) { memcpy(out, a, 12); return; }

    float bp[3] = {p[0] - b[0], p[1] - b[1], p[2] - b[2]};
    float d3 = dot(ab, bp), d4 = dot(ac, bp);
    if (d3 >= 0 && d4 <= d3) { memcpy(out, b, 12); return; }

    float vc = d1 * d4 - d3 * d2;
    if (vc <= 0 && d1 >= 0 && d3 <= 0) {
        float v = d1 / (d1 - d3);
        for (int i = 0; i < 3; i++) out[i] = a[i] + v * ab[i];
        return;
    }

    float cp[3] = {p[0] - c[0], p[1] - c[1], p[2] - c[2]};
    float d5 = dot(ab, cp), d6 = dot(ac, cp);
    if (d6 >= 0 && d5 <= d6) { memcpy(out, c, 12); return; }

    float vb = d5 * d2 - d1 * d6;
    if (vb <= 0 && d2 >= 0 && d6 <= 0) {
        float w = d2 / (d2 - d6);
        for (int i = 0; i < 3; i++) out[i] = a[i] + w * ac[i];
        return;
    }

    float va = d3 * d6 - d5 * d4;
    if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
        float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
        for (int i = 0; i < 3; i++) out[i] = b[i] + w * (c[i] - b[i]);
        return;
    }

    float denom = 1.0f / (va + vb + vc);
    float v = vb * denom, w = vc * denom;
    for (int i = 0; i < 3; i++) out[i] = a[i] + ab[i] * v + ac[i] * w;
}

}  // namespace

extern "C" {

// ------------------------------------------------------------- .cmf parsing

void* cmf_open(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;

    int32_t numTris = 0, numVerts = 0;
    if (fread(&numTris, 4, 1, f) != 1 || fread(&numVerts, 4, 1, f) != 1) {
        fclose(f);
        return nullptr;
    }
    if (std::min(numTris, numVerts) <= 0 ||
        std::max(numTris, numVerts) > MAX_VERT_OR_TRI_COUNT) {
        fclose(f);
        return nullptr;
    }

    Mesh* m = new Mesh();
    m->tris.resize((size_t)numTris * 3);
    m->verts.resize((size_t)numVerts * 3);
    bool ok =
        fread(m->tris.data(), 4, m->tris.size(), f) == m->tris.size() &&
        fread(m->verts.data(), 4, m->verts.size(), f) == m->verts.size();
    fclose(f);
    if (!ok) { delete m; return nullptr; }

    // Triangle index validation (CollisionMeshFile.cpp:44-55)
    for (int32_t idx : m->tris) {
        if (idx < 0 || idx >= numVerts) { delete m; return nullptr; }
    }
    m->hash = HashMesh(*m);
    return m;
}

void cmf_counts(void* handle, int32_t* num_tris, int32_t* num_verts) {
    Mesh* m = (Mesh*)handle;
    *num_tris = (int32_t)(m->tris.size() / 3);
    *num_verts = (int32_t)(m->verts.size() / 3);
}

void cmf_fill(void* handle, int32_t* tris_out, float* verts_out) {
    Mesh* m = (Mesh*)handle;
    memcpy(tris_out, m->tris.data(), m->tris.size() * 4);
    memcpy(verts_out, m->verts.data(), m->verts.size() * 4);
}

uint32_t cmf_hash(void* handle) { return ((Mesh*)handle)->hash; }

void cmf_close(void* handle) { delete (Mesh*)handle; }

// ----------------------------------------------------------------- SDF bake

// Bake a SIGNED-distance + direction grid from a triangle soup.
//
// Grid point (i,j,k) sits at bounds_min + cell * (i,j,k). For every grid
// point within `band` of some triangle, out_dist holds the distance to
// the nearest triangle SIGNED by the side of that triangle's plane the
// point is on (triangles must be wound so normals point into the playable
// volume — sim/soccar_mesh.py guarantees this; positive = inside).
// out_dir is the unit push-toward-inside direction. Points beyond the
// band hold +band and a zero vector.
//
// The sign is load-bearing: an unsigned field has a |d| kink AT the
// surface, and trilinear interpolation across the kink overestimates the
// distance at the surface itself (with 46 uu z-cells the floor read
// ~22 uu of clearance — suspension rays and contacts never fired and
// cars fell through the world). A signed field is linear across the
// surface, so interpolation is exact there.
void cmf_bake_sdf(const float* verts, int32_t num_verts,
                  const int32_t* tris, int32_t num_tris,
                  const float* bounds_min, const float* cell,
                  const int32_t* dims, float band,
                  float* out_dist, float* out_dir) {
    const int64_t nx = dims[0], ny = dims[1], nz = dims[2];
    const int64_t n = nx * ny * nz;
    for (int64_t i = 0; i < n; i++) out_dist[i] = band;
    memset(out_dir, 0, sizeof(float) * n * 3);

    int num_threads = std::max(1u, std::thread::hardware_concurrency());
    num_threads = std::min<int>(num_threads, 16);

    // Each thread owns a slab of the grid along x and scans all triangles
    // whose expanded AABB intersects its slab: no merge pass needed.
    auto worker = [&](int tid) {
        const int64_t x0 = nx * tid / num_threads;
        const int64_t x1 = nx * (tid + 1) / num_threads;
        float closest[3];
        for (int32_t t = 0; t < num_tris; t++) {
            const float* a = &verts[tris[t * 3 + 0] * 3];
            const float* b = &verts[tris[t * 3 + 1] * 3];
            const float* c = &verts[tris[t * 3 + 2] * 3];

            // triangle normal (winding: points toward the inside)
            float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
            float e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
            float nrm[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                            e1[2] * e2[0] - e1[0] * e2[2],
                            e1[0] * e2[1] - e1[1] * e2[0]};

            float lo[3], hi[3];
            for (int d = 0; d < 3; d++) {
                lo[d] = std::min({a[d], b[d], c[d]}) - band;
                hi[d] = std::max({a[d], b[d], c[d]}) + band;
            }
            int64_t i0 = std::max<int64_t>(
                x0, (int64_t)std::floor((lo[0] - bounds_min[0]) / cell[0]));
            int64_t i1 = std::min<int64_t>(
                x1 - 1, (int64_t)std::ceil((hi[0] - bounds_min[0]) / cell[0]));
            int64_t j0 = std::max<int64_t>(
                0, (int64_t)std::floor((lo[1] - bounds_min[1]) / cell[1]));
            int64_t j1 = std::min<int64_t>(
                ny - 1, (int64_t)std::ceil((hi[1] - bounds_min[1]) / cell[1]));
            int64_t k0 = std::max<int64_t>(
                0, (int64_t)std::floor((lo[2] - bounds_min[2]) / cell[2]));
            int64_t k1 = std::min<int64_t>(
                nz - 1, (int64_t)std::ceil((hi[2] - bounds_min[2]) / cell[2]));

            for (int64_t i = i0; i <= i1; i++) {
                for (int64_t j = j0; j <= j1; j++) {
                    for (int64_t k = k0; k <= k1; k++) {
                        float p[3] = {
                            bounds_min[0] + cell[0] * i,
                            bounds_min[1] + cell[1] * j,
                            bounds_min[2] + cell[2] * k};
                        ClosestPtTri(p, a, b, c, closest);
                        float dx = p[0] - closest[0];
                        float dy = p[1] - closest[1];
                        float dz = p[2] - closest[2];
                        float dist = std::sqrt(dx * dx + dy * dy + dz * dz);
                        int64_t idx = (i * ny + j) * nz + k;
                        if (dist < std::fabs(out_dist[idx])) {
                            float side =
                                dx * nrm[0] + dy * nrm[1] + dz * nrm[2];
                            float sgn = side >= 0 ? 1.0f : -1.0f;
                            out_dist[idx] = dist * sgn;
                            // push-toward-inside: flip for outside points
                            float inv =
                                dist > 1e-9f ? sgn / dist : 0.0f;
                            out_dir[idx * 3 + 0] = dx * inv;
                            out_dir[idx * 3 + 1] = dy * inv;
                            out_dir[idx * 3 + 2] = dz * inv;
                        }
                    }
                }
            }
        }
    };

    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; t++) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
}

}  // extern "C"
