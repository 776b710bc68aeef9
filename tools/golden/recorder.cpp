// Golden-trace recorder: drives the reference RocketSim engine through scripted
// scenarios and dumps tick-by-tick Car/Ball state as raw float32 binaries.
// Consumed by tools/golden/convert_traces.py -> tests/golden/*.npz, asserted by
// tests/test_golden_traces.py against the TPU-native engine.
//
// Reference entry points exercised:
//   RocketSim::InitFromMem   (RocketSim.cpp:102-212)
//   Arena::Create/Step       (Arena.cpp:429-566, 716-812)
//   Car::SetState/GetState   (Car.h:146-147)
//
// The SOCCAR arena is initialized with a single minimal .cmf whose one
// triangle sits flush in a far ceiling corner, outside every scenario's
// reachable space. The arena's active collision geometry is then exactly its
// four built-in analytic planes (floor/ceiling/side walls,
// Arena.cpp:1060-1105) -- the same surfaces as the TPU engine's plane soup --
// so traces compare car/ball dynamics, not mesh-vs-plane-soup geometry
// differences. Scenarios stay in |y| < 3500 so the missing back walls
// (mesh-based in the real game) are never touched.
//
// Trace format (little-endian float32 only):
//   int32 magic 0x47545243 ("GTRC"), int32 version=1,
//   int32 numRows, int32 numCars, int32 carFloats=46, int32 ballFloats=9
//   then numRows rows: [cars x (8 controls + 38 state)] + [ball 9]
// Row 0 is the initial state with zeroed controls; row t>0 holds the controls
// applied on tick t and the state after Arena::Step(1).

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <functional>
#include <map>
#include <string>
#include <vector>

#include "RocketSim.h"

using namespace RocketSim;

// ---------------------------------------------------------------- trace file

struct TraceWriter {
    FILE* f;
    int numCars;
    TraceWriter(const std::string& path, int rows, int cars) : numCars(cars) {
        f = fopen(path.c_str(), "wb");
        if (!f) { perror("fopen"); exit(1); }
        int32_t header[6] = {0x47545243, 1, rows, cars, 46, 9};
        fwrite(header, sizeof(int32_t), 6, f);
    }
    void put(float v) { fwrite(&v, sizeof(float), 1, f); }
    void putVec(const Vec& v) { put(v.x); put(v.y); put(v.z); }
    void writeRow(Arena* arena, const std::vector<Car*>& cars,
                  const std::vector<CarControls>& controls) {
        for (int i = 0; i < numCars; i++) {
            const CarControls& c = controls[i];
            put(c.throttle); put(c.steer); put(c.pitch); put(c.yaw);
            put(c.roll); put(c.jump); put(c.boost); put(c.handbrake);
            CarState s = cars[i]->GetState();
            putVec(s.pos);
            putVec(s.rotMat.forward); putVec(s.rotMat.right);
            putVec(s.rotMat.up);
            putVec(s.vel); putVec(s.angVel);
            put(s.isOnGround);
            put(s.hasJumped); put(s.hasDoubleJumped); put(s.hasFlipped);
            putVec(s.flipRelTorque);
            put(s.jumpTime); put(s.flipTime);
            put(s.isFlipping); put(s.isJumping);
            put(s.airTime); put(s.airTimeSinceJump);
            put(s.boost); put(s.timeSpentBoosting);
            put(s.isSupersonic); put(s.supersonicTime);
            put(s.handbrakeVal);
            put(s.isAutoFlipping); put(s.autoFlipTimer);
        }
        BallState b = arena->ball->GetState();
        putVec(b.pos); putVec(b.vel); putVec(b.angVel);
    }
    ~TraceWriter() { fclose(f); }
};

// ------------------------------------------------------------- control script

// Piecewise-constant control schedule: each segment applies until tick
// `until` (exclusive).
struct Seg {
    int until;
    CarControls c;
};
using Script = std::vector<Seg>;

static CarControls at(const Script& s, int tick) {
    for (const auto& seg : s)
        if (tick < seg.until) return seg.c;
    return s.empty() ? CarControls{} : s.back().c;
}

static CarControls ctl(float throttle = 0, float steer = 0, float pitch = 0,
                       float yaw = 0, float roll = 0, bool jump = false,
                       bool boost = false, bool handbrake = false) {
    CarControls c = {};
    c.throttle = throttle; c.steer = steer; c.pitch = pitch; c.yaw = yaw;
    c.roll = roll; c.jump = jump; c.boost = boost; c.handbrake = handbrake;
    return c;
}

// ----------------------------------------------------------------- scenarios

struct Scenario {
    std::string name;
    int numTicks;
    int numCars;
    // set initial car/ball states; car[i] already added on BLUE/ORANGE alt.
    std::function<void(Arena*, std::vector<Car*>&)> setup;
    // per-car control scripts
    std::vector<Script> scripts;
};

static CarState carAt(Vec pos, float yaw = 0, float pitch = 0, float roll = 0,
                      Vec vel = {0, 0, 0}, Vec angVel = {0, 0, 0},
                      float boost = 100.f / 3) {
    CarState cs = {};
    cs.pos = pos;
    cs.rotMat = Angle(yaw, pitch, roll).ToRotMat();
    cs.vel = vel;
    cs.angVel = angVel;
    cs.boost = boost;
    cs.isOnGround = false;  // recomputed by suspension on first tick
    return cs;
}

static BallState ballAt(Vec pos, Vec vel = {0, 0, 0}, Vec angVel = {0, 0, 0}) {
    BallState bs = {};
    bs.pos = pos;
    bs.vel = vel;
    bs.angVel = angVel;
    return bs;
}

// Ball parked in a far corner with zero velocity: zero-vel sleeping
// (Arena.cpp:721-727) keeps it inert for car-only scenarios.
static const Vec BALL_PARKED = Vec(3500, -3500, 93.15f);

static constexpr float REST_Z = 17.01f;  // octane resting ride height

// Hand-authored ramp prism for --mesh mode: slope rises from z=0 at
// x=1200 to z=400 at x=2000, extruded y in [-1000, 1000]. Outward
// winding; the coplanar-with-floor underside is omitted (unreachable,
// and coincident opposite-normal surfaces would make the SDF sign
// ambiguous at z=0). The same bytes are written to <outDir>/ramp.cmf and
// baked into the replay side's SDF world, so both engines collide with
// the identical triangle soup through their own mesh pipelines.
static std::vector<char> rampCmfBytes() {
    struct __attribute__((packed)) {
        int32_t numTris = 8, numVerts = 6;
        int32_t tris[8 * 3] = {
            // slope (v0 v2 v5) (v0 v5 v3): outward ~(-0.447, 0, 0.894)
            0, 2, 5, 0, 5, 3,
            // back x=2000 (v1 v4 v5) (v1 v5 v2): outward +x
            1, 4, 5, 1, 5, 2,
            // end caps
            0, 1, 2,            // y=-1000, outward -y
            3, 5, 4,            // y=+1000, outward +y
        };
        // .cmf verts are BULLET units: MakeBulletMesh adds the raw floats
        // into the BT-unit world (CollisionMeshFile.cpp:64-74). UU / 50.
        float verts[6 * 3] = {
            24.f, -20.f, 0.f,         // v0 (1200, -1000, 0) UU
            40.f, -20.f, 0.f,         // v1 (2000, -1000, 0)
            40.f, -20.f, 8.f,         // v2 (2000, -1000, 400)
            24.f, 20.f, 0.f,          // v3 (1200, 1000, 0)
            40.f, 20.f, 0.f,          // v4 (2000, 1000, 0)
            40.f, 20.f, 8.f,          // v5 (2000, 1000, 400)
        };
    } cmf;
    std::vector<char> bytes(sizeof(cmf));
    memcpy(bytes.data(), &cmf, sizeof(cmf));
    return bytes;
}

// Concave quarter-pipe fillet along the -x side wall: the real arena's
// floor-wall transition is curved (the dumped soccar meshes; unavailable),
// so an equivalent faceted quarter-cylinder (radius 260, 12 segments,
// y in [-1200, 1200]) is authored identically into both engines. Surface
// runs tangent from the floor at x = -3836 to the wall at z = 260; the
// solid is closed with end-cap fans (the floor/wall-coplanar faces are
// omitted like the ramp's underside — coincident opposite-normal surfaces
// make the SDF sign ambiguous).
static std::vector<char> filletCmfBytes() {
    constexpr int SEGS = 12;
    constexpr float R = 260.f, X0 = -4096.f, Y0 = -1200.f, Y1 = 1200.f;
    const float cxAxis = X0 + R;          // cylinder axis x, z = R
    std::vector<float> verts;             // BT units
    std::vector<int32_t> tris;
    auto addVert = [&](float x, float y, float z) {
        verts.push_back(x / 50.f); verts.push_back(y / 50.f);
        verts.push_back(z / 50.f);
        return (int32_t)(verts.size() / 3 - 1);
    };
    // arc rows: i = 0 at the wall tangent (x=-4096, z=R) .. SEGS at the
    // floor tangent (x=-3836, z=0); two y rows each
    std::vector<int32_t> rowA(SEGS + 1), rowB(SEGS + 1);
    for (int i = 0; i <= SEGS; i++) {
        float th = (float)M_PI * (1.0f + 0.5f * i / SEGS);   // 180..270 deg
        float x = cxAxis + R * cosf(th), z = R + R * sinf(th);
        rowA[i] = addVert(x, Y0, z);
        rowB[i] = addVert(x, Y1, z);
    }
    // fillet surface: normals point toward the axis center (+x, +z — the
    // playable side). With u = B_i - A_i = (0, +dy, 0) and
    // v = B_{i+1} - A_i = (+dx, dy, -dz), u x v = (dy*-dz, 0, -dy*dx)
    // points into the material, so wind the other way.
    for (int i = 0; i < SEGS; i++) {
        tris.insert(tris.end(), {rowA[i], rowB[i + 1], rowB[i]});
        tris.insert(tris.end(), {rowA[i], rowA[i + 1], rowB[i + 1]});
    }
    // end caps: fan from the wall-floor corner (x=-4096, z=0); outward
    // normals -y at Y0 and +y at Y1
    int cornerA = addVert(X0, Y0, 0), cornerB = addVert(X0, Y1, 0);
    for (int i = 0; i < SEGS; i++) {
        tris.insert(tris.end(), {cornerA, rowA[i + 1], rowA[i]});
        tris.insert(tris.end(), {cornerB, rowB[i], rowB[i + 1]});
    }
    struct __attribute__((packed)) Hdr { int32_t numTris, numVerts; } hdr;
    hdr.numTris = (int32_t)tris.size() / 3;
    hdr.numVerts = (int32_t)verts.size() / 3;
    std::vector<char> bytes(sizeof(hdr) + tris.size() * 4 + verts.size() * 4);
    char* p = bytes.data();
    memcpy(p, &hdr, sizeof(hdr)); p += sizeof(hdr);
    memcpy(p, tris.data(), tris.size() * 4); p += tris.size() * 4;
    memcpy(p, verts.data(), verts.size() * 4);
    return bytes;
}

// ---- hoops rim + net meshes (--hoops-mesh mode) ----
//
// RocketSim's hoops world is 6 analytic planes + dumped .cmf meshes; the
// basket NET is identified by its exact vertex count (505) and added with
// collision group/mask CollisionMasks::HOOPS_NET so only the ball touches
// it (Arena.cpp:1041-1055, Arena.h:164, Ball.cpp:109). These hand-authored
// stand-ins exercise that masking end-to-end through both engines:
//   hoops_net.cmf — closed annular shell, r 716..776, z 0..365, 126
//                   segments = 504 verts + 1 unreferenced dummy = 505
//                   (MakeBulletMesh adds every file vertex verbatim with
//                   findOrAddVertex(..., false), so the bullet mesh's
//                   vertex count equals the file's and trips the
//                   HOOPS_NET_NUM_VERTS check).
//   hoops_rim.cmf — annular ring solid, r 716..776, z 365..415, 48
//                   segments = 192 verts: ordinary world collision.
// Both sit at the +y basket footprint of Arena::IsBallScored /
// BallWithinHoopsGoalXYMarginSq (center (0, 2770/0.9), radius 716,
// Arena.cpp:816-826, APPROX_RIM_HEIGHT 365 :866-869).

static std::vector<char> makeCmf(const std::vector<int32_t>& tris,
                                 const std::vector<float>& verts) {
    int32_t numTris = (int32_t)tris.size() / 3;
    int32_t numVerts = (int32_t)verts.size() / 3;
    std::vector<char> b;
    auto put = [&](const void* p, size_t n) {
        b.insert(b.end(), (const char*)p, (const char*)p + n);
    };
    put(&numTris, 4); put(&numVerts, 4);
    put(tris.data(), tris.size() * 4);
    put(verts.data(), verts.size() * 4);
    return b;
}

// Closed annular shell (tube with rectangular cross-section) around
// (cx, cy): radii ri..ro, heights z0..z1, R segments. All quads wound so
// normals point AWAY from the solid material (the SDF bake on the replay
// side derives the distance sign from triangle normals). Verts in BULLET
// units (UU / 50, CollisionMeshFile.cpp:64-74).
static std::vector<char> annularShellCmf(float cx, float cy, float ri,
                                         float ro, float z0, float z1,
                                         int R, int dummyVerts) {
    std::vector<float> verts;
    std::vector<int32_t> tris;
    // rings: 0 = outer@z0, 1 = outer@z1, 2 = inner@z1, 3 = inner@z0
    for (int ring = 0; ring < 4; ring++) {
        float r = (ring < 2) ? ro : ri;
        float z = (ring == 1 || ring == 2) ? z1 : z0;
        for (int i = 0; i < R; i++) {
            float a = 2.0f * (float)M_PI * i / R;
            verts.push_back((cx + r * cosf(a)) / 50.f);
            verts.push_back((cy + r * sinf(a)) / 50.f);
            verts.push_back(z / 50.f);
        }
    }
    auto vat = [&](int idx, float out[3]) {
        out[0] = verts[idx * 3]; out[1] = verts[idx * 3 + 1];
        out[2] = verts[idx * 3 + 2];
    };
    // quad (a,b,c,d) wound so the normal points away from `ref`
    auto quad = [&](int a, int b, int c, int d, const float ref[3]) {
        float av[3], bv[3], cv[3];
        vat(a, av); vat(b, bv); vat(c, cv);
        float e1[3] = {bv[0]-av[0], bv[1]-av[1], bv[2]-av[2]};
        float e2[3] = {cv[0]-av[0], cv[1]-av[1], cv[2]-av[2]};
        float n[3] = {e1[1]*e2[2]-e1[2]*e2[1], e1[2]*e2[0]-e1[0]*e2[2],
                      e1[0]*e2[1]-e1[1]*e2[0]};
        float cen[3] = {(av[0]+bv[0]+cv[0])/3, (av[1]+bv[1]+cv[1])/3,
                        (av[2]+bv[2]+cv[2])/3};
        float toRef[3] = {ref[0]-cen[0], ref[1]-cen[1], ref[2]-cen[2]};
        bool toward = n[0]*toRef[0] + n[1]*toRef[1] + n[2]*toRef[2] > 0;
        if (!toward) {  // normal already away from the material ref
            tris.insert(tris.end(), {a, b, c, a, c, d});
        } else {
            tris.insert(tris.end(), {a, c, b, a, d, c});
        }
    };
    auto V = [R](int ring, int i) { return ring * R + (i % R); };
    float rm = (ri + ro) / 2, zm = (z0 + z1) / 2;
    for (int i = 0; i < R; i++) {
        int j = i + 1;
        float am = 2.0f * (float)M_PI * (i + 0.5f) / R;
        // material interior reference for this segment (BT units)
        float ref[3] = {(cx + rm * cosf(am)) / 50.f,
                        (cy + rm * sinf(am)) / 50.f, zm / 50.f};
        quad(V(0, i), V(0, j), V(1, j), V(1, i), ref);   // outer wall
        quad(V(2, i), V(2, j), V(3, j), V(3, i), ref);   // inner wall
        quad(V(1, i), V(1, j), V(2, j), V(2, i), ref);   // top annulus
        quad(V(3, i), V(3, j), V(0, j), V(0, i), ref);   // bottom annulus
    }
    for (int i = 0; i < dummyVerts; i++) {    // unreferenced; vertex-count
        verts.push_back(verts[0]);            // padding for the 505 check
        verts.push_back(verts[1]);
        verts.push_back(verts[2]);
    }
    return makeCmf(tris, verts);
}

static constexpr float HOOP_CY = 2770.f / 0.9f;   // 3077.78

int main(int argc, char** argv) {
    std::string outDir = argc > 1 ? argv[1] : "traces";
    bool meshMode = argc > 2 && strcmp(argv[2], "--mesh") == 0;
    bool hoopsMeshMode = argc > 2 && strcmp(argv[2], "--hoops-mesh") == 0;

    // Minimal valid .cmf: one triangle flush in a far +x/-y ceiling corner.
    {
        struct __attribute__((packed)) {
            int32_t numTris = 1, numVerts = 3;
            int32_t tri[3] = {0, 1, 2};
            // BT units (UU / 50): flush in the far +x/-y ceiling corner
            float verts[9] = {
                81.8f, -102.3f, 40.86f,
                81.9f, -102.3f, 40.86f,
                81.9f, -102.2f, 40.86f,
            };
        } cmf;
        std::vector<char> bytes(sizeof(cmf));
        memcpy(bytes.data(), &cmf, sizeof(cmf));
        std::map<GameMode, std::vector<FileData>> files;
        files[GameMode::SOCCAR].push_back(
            FileData(bytes.begin(), bytes.end()));
        // Hoops needs >= 1 mesh (Arena.cpp:1021-1026 fatals otherwise);
        // same trick: one triangle flush in a far hoops ceiling corner
        // (BT units), outside every scenario's reachable space.
        struct __attribute__((packed)) {
            int32_t numTris = 1, numVerts = 3;
            int32_t tri[3] = {0, 1, 2};
            float verts[9] = {
                59.1f, -71.5f, 36.39f,
                59.2f, -71.5f, 36.39f,
                59.2f, -71.4f, 36.39f,
            };
        } hoopsCmf;
        std::vector<char> hoopsBytes(sizeof(hoopsCmf));
        memcpy(hoopsBytes.data(), &hoopsCmf, sizeof(hoopsCmf));
        files[GameMode::HOOPS].push_back(
            FileData(hoopsBytes.begin(), hoopsBytes.end()));
        if (meshMode) {
            auto ramp = rampCmfBytes();
            auto fillet = filletCmfBytes();
            files[GameMode::SOCCAR].push_back(
                FileData(ramp.begin(), ramp.end()));
            files[GameMode::SOCCAR].push_back(
                FileData(fillet.begin(), fillet.end()));
            const char* mnames[2] = {"/ramp.cmf", "/fillet.cmf"};
            std::vector<char>* mbufs[2] = {&ramp, &fillet};
            for (int i = 0; i < 2; i++) {
                FILE* f = fopen((outDir + mnames[i]).c_str(), "wb");
                fwrite(mbufs[i]->data(), 1, mbufs[i]->size(), f);
                fclose(f);
            }
        }
        if (hoopsMeshMode) {
            // +y basket: net (505 verts -> ball-only) + rim (world)
            auto net = annularShellCmf(0, HOOP_CY, 716, 776, 0, 365,
                                       126, 1);     // 504 + 1 dummy = 505
            auto rim = annularShellCmf(0, HOOP_CY, 716, 776, 365, 415,
                                       48, 0);      // 192 verts
            for (auto* m : {&net, &rim})
                files[GameMode::HOOPS].push_back(
                    FileData(m->begin(), m->end()));
            const char* names[2] = {"/hoops_net.cmf", "/hoops_rim.cmf"};
            std::vector<char>* bufs[2] = {&net, &rim};
            for (int i = 0; i < 2; i++) {
                FILE* f = fopen((outDir + names[i]).c_str(), "wb");
                fwrite(bufs[i]->data(), 1, bufs[i]->size(), f);
                fclose(f);
            }
        }
        RocketSim::InitFromMem(files, true);
    }

    std::vector<Scenario> scenarios;
    auto add = [&](Scenario s) { scenarios.push_back(std::move(s)); };

    auto soloSetup = [](CarState cs) {
        return [cs](Arena* a, std::vector<Car*>& cars) {
            cars[0]->SetState(cs);
            a->ball->SetState(ballAt(BALL_PARKED));
        };
    };


    // --- ground driving ---
    add({"drive_throttle", 300, 1,
         soloSetup(carAt({0, -1000, REST_Z}, 0)),
         {{{300, ctl(1)}}}});
    add({"drive_reverse", 240, 1,
         soloSetup(carAt({0, 1000, REST_Z}, 0)),
         {{{240, ctl(-1)}}}});
    add({"drive_steer", 400, 1,
         soloSetup(carAt({0, -2000, REST_Z}, 0)),
         {{{400, ctl(1, 1)}}}});
    add({"powerslide", 300, 1,
         soloSetup(carAt({-1000, -1000, REST_Z}, 0, 0, 0, {1400, 0, 0})),
         {{{300, ctl(1, 1, 0, 0, 0, false, false, true)}}}});
    add({"brake", 200, 1,
         soloSetup(carAt({-1500, 0, REST_Z}, 0, 0, 0, {1400, 0, 0})),
         {{{200, ctl(-1)}}}});
    add({"coast", 300, 1,
         soloSetup(carAt({-1500, 500, REST_Z}, 0, 0, 0, {1000, 0, 0})),
         {{{300, ctl()}}}});
    add({"handbrake_tap", 150, 1,
         soloSetup(carAt({0, 0, REST_Z}, 0, 0, 0, {900, 0, 0})),
         {{{30, ctl(1)},
           {45, ctl(1, 0, 0, 0, 0, false, false, true)},
           {150, ctl(1)}}}});

    // --- jumps / flips ---
    add({"jump_hold", 200, 1,
         soloSetup(carAt({0, 0, REST_Z}, 0)),
         {{{25, ctl(0, 0, 0, 0, 0, true)}, {200, ctl()}}}});
    add({"jump_tap", 200, 1,
         soloSetup(carAt({0, 300, REST_Z}, 0)),
         {{{4, ctl(0, 0, 0, 0, 0, true)}, {200, ctl()}}}});
    add({"double_jump", 250, 1,
         soloSetup(carAt({0, -300, REST_Z}, 0)),
         {{{8, ctl(0, 0, 0, 0, 0, true)},
           {30, ctl()},
           {38, ctl(0, 0, 0, 0, 0, true)},
           {250, ctl()}}}});
    add({"flip_forward", 250, 1,
         soloSetup(carAt({0, -800, REST_Z}, 0, 0, 0, {500, 0, 0})),
         {{{8, ctl(0, 0, 0, 0, 0, true)},
           {24, ctl()},
           {32, ctl(0, 0, -1, 0, 0, true)},
           {250, ctl()}}}});
    add({"flip_sideways", 250, 1,
         soloSetup(carAt({0, 800, REST_Z}, 0, 0, 0, {800, 0, 0})),
         {{{8, ctl(0, 0, 0, 0, 0, true)},
           {24, ctl()},
           {32, ctl(0, 0, 0, 1, 0, true)},
           {250, ctl()}}}});
    add({"flip_cancel", 250, 1,
         soloSetup(carAt({-500, 0, REST_Z}, 0, 0, 0, {600, 0, 0})),
         {{{8, ctl(0, 0, 0, 0, 0, true)},
           {24, ctl()},
           {32, ctl(0, 0, -1, 0, 0, true)},
           {40, ctl(0, 0, -1)},
           {120, ctl(0, 0, 1)},   // hold pitch back: cancels the flip pitch
           {250, ctl()}}}});
    add({"auto_flip", 200, 1,
         // on its roof: auto-flip on jump (Car.cpp:763-797). Roll 3.1
         // (not pi): a flat roof-rest settles to roll = +-pi with the
         // sign set by contact-solver noise, and the auto-flip DIRECTION
         // is sign(roll) — a knife edge no two engines resolve
         // identically. Jump is pressed at first contact instead, while
         // roll is still unambiguously positive (> ROLL_THRESH 2.8).
         soloSetup(carAt({500, 500, 40}, 0, 0, 3.1f)),
         {{{3, ctl()}, {80, ctl(0, 0, 0, 0, 0, true)}, {200, ctl()}}}});

    // --- boost / air control ---
    add({"boost_ground", 300, 1,
         soloSetup(carAt({-2000, -2500, REST_Z}, 0)),
         {{{300, ctl(1, 0, 0, 0, 0, false, true)}}}});
    add({"boost_tap", 150, 1,
         // minimum boosting time (Car.cpp:477-505)
         soloSetup(carAt({-1000, 2500, REST_Z}, 0)),
         {{{5, ctl(0, 0, 0, 0, 0, false, true)}, {150, ctl()}}}});
    add({"boost_air_pitched", 300, 1,
         soloSetup(carAt({-2000, 0, 300}, 0, 0.6f, 0, {300, 0, 200})),
         {{{300, ctl(0, 0, 0, 0, 0, false, true)}}}});
    add({"air_pitch", 280, 1,
         soloSetup(carAt({0, 0, 400}, 0, 0, 0, {0, 0, 1000})),
         {{{140, ctl(0, 0, 1)}, {280, ctl(0, 0, -0.5f)}}}});
    add({"air_yaw_roll", 280, 1,
         soloSetup(carAt({500, -500, 400}, 0, 0, 0, {0, 0, 900})),
         {{{140, ctl(0, 0, 0, 1, 0.5f)}, {280, ctl()}}}});
    add({"air_damping", 300, 1,
         // spin up then release: angular damping & clamp (5.5 rad/s)
         soloSetup(carAt({0, 0, 600}, 0, 0, 0, {0, 0, 800},
                         {0, 6.0f, 2.0f})),
         {{{300, ctl()}}}});
    add({"supersonic", 300, 1,
         soloSetup(carAt({-3500, -1500, REST_Z}, 0, 0, 0, {2200, 0, 0})),
         {{{300, ctl(1, 0, 0, 0, 0, false, true)}}}});

    // --- walls / ceiling (side walls are analytic planes) ---
    add({"wall_drive", 260, 1,
         // on the -x side wall, nose +y, driving along the wall
         soloSetup(carAt({-4096 + REST_Z, 0, 800},
                         (float)(M_PI / 2), 0, (float)(-M_PI / 2),
                         {0, 600, 0})),
         {{{260, ctl(1)}}}});
    add({"ceiling_stick", 200, 1,
         soloSetup(carAt({0, 0, 2044 - REST_Z}, 0, 0, (float)M_PI,
                         {800, 0, 0})),
         {{{200, ctl(1)}}}});

    // --- ball only (car parked far away, idle) ---
    auto ballSetup = [](BallState bs) {
        return [bs](Arena* a, std::vector<Car*>& cars) {
            cars[0]->SetState(carAt({3600, 3600, REST_Z}, 0));
            a->ball->SetState(bs);
        };
    };
    // epsilon vel: zero-vel balls sleep (Arena.cpp:721-727)
    add({"ball_drop", 400, 1,
         ballSetup(ballAt({0, 0, 1000}, {0, 0, -1})),
         {{{400, ctl()}}}});
    add({"ball_roll", 400, 1,
         ballSetup(ballAt({-1000, 0, 93.15f}, {1200, 300, 0})),
         {{{400, ctl()}}}});
    add({"ball_bounce_spin", 350, 1,
         ballSetup(ballAt({0, -500, 400}, {800, 0, -1200}, {0, 3, 0})),
         {{{350, ctl()}}}});
    add({"ball_wall_bounce", 300, 1,
         ballSetup(ballAt({-3000, 200, 600}, {-1800, 300, 200})),
         {{{300, ctl()}}}});
    add({"ball_arc", 450, 1,
         ballSetup(ballAt({-800, -1500, 200}, {600, 400, 1400},
                          {1, -2, 0.5f})),
         {{{450, ctl()}}}});
    add({"ball_fast_clamp", 300, 1,
         // near the 6000 uu/s speed clamp + drag
         ballSetup(ballAt({-2000, 0, 800}, {5900, 0, 500})),
         {{{300, ctl()}}}});

    // --- car-ball interaction ---
    add({"car_ball_hit", 240, 1,
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(
                 carAt({-600, 0, REST_Z}, 0, 0, 0, {1400, 0, 0}));
             a->ball->SetState(ballAt({0, 0, 93.15f}));
         },
         {{{240, ctl(1)}}}});
    add({"car_ball_hit_angled", 240, 1,
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(
                 carAt({-500, -350, REST_Z}, 0.6f, 0, 0,
                       {1100, 760, 0}));
             a->ball->SetState(ballAt({0, 0, 93.15f}));
         },
         {{{240, ctl(1)}}}});
    add({"car_ball_aerial", 200, 1,
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(
                 carAt({-400, 0, 300}, 0, 0.3f, 0, {900, 0, 300}));
             a->ball->SetState(ballAt({200, 0, 500}, {0, 0, -100}));
         },
         {{{200, ctl(0, 0, 0, 0, 0, false, true)}}}});

    // --- car-car ---
    add({"car_bump", 200, 2,
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(
                 carAt({-1200, 0, REST_Z}, 0, 0, 0, {1800, 0, 0}));
             cars[1]->SetState(carAt({0, 0, REST_Z}, 0));
             a->ball->SetState(ballAt(BALL_PARKED));
         },
         {{{200, ctl(1)}}, {{200, ctl()}}}});
    add({"car_demo", 200, 2,
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(
                 carAt({-1500, 0, REST_Z}, 0, 0, 0, {2250, 0, 0}));
             cars[1]->SetState(carAt({0, 0, REST_Z},
                                     (float)(M_PI / 2)));
             a->ball->SetState(ballAt(BALL_PARKED));
         },
         {{{200, ctl(1, 0, 0, 0, 0, false, true)}}, {{200, ctl()}}}});

    // --- boost pads: drive over the big pad at (-3584, 0), then small
    // pads; records boost gain + pickup timing (BoostPad.cpp:51-105) ---
    add({"pad_pickup_big", 300, 1,
         soloSetup(carAt({-3900, 0, REST_Z}, 0, 0, 0, {600, 0, 0}, {0, 0, 0},
                         10.f)),
         {{{300, ctl(1)}}}});
    add({"pad_pickup_small_row", 360, 1,
         // small pads at (0, -4240), (-1792, -4184), (1792, -4184):
         // drive along y=-4240-ish from -2200 to +2200
         soloSetup(carAt({-2200, -4240, REST_Z}, 0, 0, 0, {800, 0, 0},
                         {0, 0, 0}, 20.f)),
         {{{360, ctl(1)}}}});

    // --- snowday puck (cylinder hull, Ball.cpp:51-81) ---
    // Scenario names prefixed "snowday_"/"heatseeker_" pick that game mode.
    add({"snowday_puck_drop", 300, 1,
         ballSetup(ballAt({0, 0, 500}, {0, 0, -1})),
         {{{300, ctl()}}}});
    add({"snowday_puck_slide", 300, 1,
         ballSetup(ballAt({-1000, 0, 31.3f}, {900, 200, 0})),
         {{{300, ctl()}}}});
    add({"snowday_puck_spin_bounce", 300, 1,
         ballSetup(ballAt({0, -400, 400}, {600, 0, -800}, {0, 4, 1})),
         {{{300, ctl()}}}});
    add({"snowday_car_puck_hit", 240, 1,
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(
                 carAt({-600, 0, REST_Z}, 0, 0, 0, {1300, 0, 0}));
             a->ball->SetState(ballAt({0, 0, 31.3f}, {0, 0, -1}));
         },
         {{{240, ctl(1)}}}});

    add({"heatseeker_homing", 300, 1,
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(carAt({3600, -3600, REST_Z}, 0));
             BallState bs = ballAt({0, 0, 400}, {500, 800, 300});
             bs.hsInfo.yTargetDir = 1.0f;
             a->ball->SetState(bs);
         },
         {{{300, ctl()}}}});
    add({"heatseeker_onhit", 260, 1,
         // car drives into the homing ball: _OnHit flips the target dir
         // and bumps the target speed (Ball.cpp:203-215)
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(
                 carAt({-600, 0, REST_Z}, 0, 0, 0, {1300, 0, 0}));
             BallState bs = ballAt({100, 0, 120}, {-400, 0, 0});
             bs.hsInfo.yTargetDir = -1.0f;   // heading to blue's net
             a->ball->SetState(bs);
         },
         {{{260, ctl(1)}}}});

    // --- hoops mode (meshless: 6 planes incl. y walls, Arena.cpp:1030,
    // 1103-1120; the rim/net meshes are absent, so scenarios stay away
    // from the goal regions) + snowday puck vs side wall ---
    add({"hoops_ball_bounce", 240, 1,
         // hoops ball radius/gravity mutator parity + y-wall bounce
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(carAt({-2000, -2000, REST_Z}, 0));
             a->ball->SetState(ballAt({0, 800, 700}, {300, 900, 50}));
         },
         {{{240, ctl()}}}});
    add({"hoops_pad_pickup", 200, 1,
         // drives through the (2432, 0) big pad (LOCS_BIG_HOOPS) into the
         // +x wall (ARENA_EXTENT_X_HOOPS = 2966.67)
         soloSetup(carAt({1200, 0, REST_Z}, 0, 0, 0, {800, 0, 0}, {0, 0, 0},
                         40.0f)),
         {{{200, ctl(1, 0, 0, 0, 0, false, true)}}}});
    add({"snowday_puck_wall", 300, 1,
         // puck slides/spins into the -x side wall: cylinder-wall contact
         [](Arena* a, std::vector<Car*>& cars) {
             cars[0]->SetState(carAt({2000, 2000, REST_Z}, 0));
             a->ball->SetState(ballAt({-3300, 500, 100},
                                      {-900, 300, 50}, {0, 2, 6}));
         },
         {{{300, ctl()}}}});

    // --- non-Octane car presets (CarConfig.cpp tables): steer sweep +
    // jump/flip per preset. Validates hitbox/wheel/suspension tables and
    // the margin-shrunk effective-box inertia across every preset —
    // Merc's min half extent exceeds bullet's 0.04 m margin cap, the
    // other four shrink (sim/car_config.py:bullet_effective_half_extents).
    for (const char* preset :
         {"dominus", "plank", "breakout", "hybrid", "merc"}) {
        std::string p(preset);
        add({"cfg_" + p + "_steer", 300, 1,
             // spawn above ride height; settles in the first ~20 ticks
             soloSetup(carAt({-1500, -1500, 25}, 0)),
             {{{30, ctl()},
               {140, ctl(1, 1)},
               {200, ctl(1, 1, 0, 0, 0, false, false, true)},
               {260, ctl(1, -1, 0, 0, 0, false, true)},
               {300, ctl(-1)}}}});
        add({"cfg_" + p + "_flip", 220, 1,
             soloSetup(carAt({500, -1000, 25}, 0)),
             {{{30, ctl(1)},
               {38, ctl(1, 0, 0, 0, 0, true)},
               {52, ctl(1)},
               {60, ctl(0, 0, 0, 1, 0, true)},   // sideways flip
               {220, ctl()}}}});
    }

    if (meshMode) {
        // --mesh: ONLY the ramp scenarios (the ramp is in the SOCCAR world
        // for this process, so the plane-world scenario set above would
        // record different trajectories wherever it crosses the ramp).
        scenarios.clear();
        add({"mesh_ramp_drive", 300, 1,
             // y=400 stays between boost-pad columns; boosts up the
             // slope, launches off the 400-uu top edge, lands on floor
             soloSetup(carAt({200, 400, REST_Z}, 0)),
             {{{260, ctl(1, 0, 0, 0, 0, false, true)}, {300, ctl()}}}});
        add({"mesh_ramp_ball", 300, 1,
             // ball arcs onto the mid-slope and bounces up-back
             [](Arena* a, std::vector<Car*>& cars) {
                 cars[0]->SetState(carAt({-2000, -2000, REST_Z}, 0));
                 a->ball->SetState(ballAt({600, 300, 200}, {900, 0, 100}));
             },
             {{{300, ctl()}}}});
        add({"mesh_fillet_drive", 270, 1,
             // boosts into the quarter-pipe fillet and rides it up onto
             // the -x wall: the floor-to-wall transition every wall play
             // goes through, continuous suspension over a curved surface
             soloSetup(carAt({-2500, 0, REST_Z}, (float)M_PI, 0, 0,
                             {-500, 0, 0})),
             {{{150, ctl(1, 0, 0, 0, 0, false, true)},
               {270, ctl(1)}}}});
        add({"mesh_fillet_ball", 300, 1,
             // ball rolls into the fillet, curves up the wall, rolls back
             [](Arena* a, std::vector<Car*>& cars) {
                 cars[0]->SetState(carAt({-2000, -2000, REST_Z}, 0));
                 a->ball->SetState(ballAt({-3000, 200, 93.15f},
                                          {-1200, 0, 0}));
             },
             {{{300, ctl()}}}});
    }

    if (hoopsMeshMode) {
        // --hoops-mesh: ONLY basket scenarios (this process's HOOPS world
        // carries the authored rim + net meshes).
        scenarios.clear();
        auto parkedCar = [](Arena* a, std::vector<Car*>& cars) {
            // parked on the floor well away from the basket, inside the
            // replay side's SDF grid bounds
            cars[0]->SetState(carAt({1800, 1400, REST_Z}, 0));
        };
        add({"hoopsmesh_rim_bounce", 240, 1,
             // ball dropped onto the rim ring's flat top (r = 746 from
             // the hoop axis, inside the 716..776 band)
             [parkedCar](Arena* a, std::vector<Car*>& cars) {
                 parkedCar(a, cars);
                 a->ball->SetState(
                     ballAt({0, HOOP_CY - 746, 900}, {0, 0, -1}));
             },
             {{{240, ctl()}}}});
        add({"hoopsmesh_net_outside", 300, 1,
             // ball flies field-side into the net's OUTER wall below rim
             // height and bounces back (ball-net collision enabled)
             [parkedCar](Arena* a, std::vector<Car*>& cars) {
                 parkedCar(a, cars);
                 a->ball->SetState(
                     ballAt({0, 2000, 150}, {0, 1100, 0}));
             },
             {{{300, ctl()}}}});
        add({"hoopsmesh_ball_in", 400, 1,
             // dropped through the hoop mouth with lateral drift: grazes
             // the inner wall on the way down, lands inside the basket,
             // stays contained (concave ball-only contact)
             [parkedCar](Arena* a, std::vector<Car*>& cars) {
                 parkedCar(a, cars);
                 a->ball->SetState(
                     ballAt({0, HOOP_CY, 1000}, {220, 0, 0}));
             },
             {{{400, ctl()}}}});
        add({"hoopsmesh_car_through_net", 140, 1,
             // car drives straight through the net shell (both walls of
             // the near side, y 2301..2361): HOOPS_NET masking means the
             // trajectory is identical to open floor; ends before the
             // y = 3581 back wall
             soloSetup(carAt({0, 1900, REST_Z}, (float)(M_PI / 2))),
             {{{140, ctl(1)}}}});
        add({"hoopsmesh_car_rim", 240, 1,
             // airborne car arcs into the rim ring's outer wall: the rim
             // is ordinary world collision for cars
             soloSetup(carAt({0, 2050, 300}, (float)(M_PI / 2), 0, 0,
                             {0, 800, 350})),
             {{{240, ctl()}}}});
    }

    for (auto& sc : scenarios) {
        GameMode mode = GameMode::SOCCAR;
        if (sc.name.rfind("snowday_", 0) == 0) mode = GameMode::SNOWDAY;
        if (sc.name.rfind("heatseeker_", 0) == 0)
            mode = GameMode::HEATSEEKER;
        if (sc.name.rfind("hoops_", 0) == 0 ||
            sc.name.rfind("hoopsmesh_", 0) == 0) mode = GameMode::HOOPS;
        const CarConfig* cfg = &CAR_CONFIG_OCTANE;
        if (sc.name.rfind("cfg_dominus_", 0) == 0) cfg = &CAR_CONFIG_DOMINUS;
        if (sc.name.rfind("cfg_plank_", 0) == 0) cfg = &CAR_CONFIG_PLANK;
        if (sc.name.rfind("cfg_breakout_", 0) == 0)
            cfg = &CAR_CONFIG_BREAKOUT;
        if (sc.name.rfind("cfg_hybrid_", 0) == 0) cfg = &CAR_CONFIG_HYBRID;
        if (sc.name.rfind("cfg_merc_", 0) == 0) cfg = &CAR_CONFIG_MERC;
        Arena* arena = Arena::Create(mode, {}, 120);
        std::vector<Car*> cars;
        for (int i = 0; i < sc.numCars; i++)
            cars.push_back(arena->AddCar(
                i % 2 == 0 ? Team::BLUE : Team::ORANGE, *cfg));
        sc.setup(arena, cars);

        TraceWriter w(outDir + "/" + sc.name + ".bin",
                      sc.numTicks + 1, sc.numCars);
        std::vector<CarControls> zeros(sc.numCars);
        w.writeRow(arena, cars, zeros);
        for (int t = 0; t < sc.numTicks; t++) {
            std::vector<CarControls> cs;
            for (int i = 0; i < sc.numCars; i++) {
                CarControls c = at(sc.scripts[i], t);
                cars[i]->controls = c;
                cs.push_back(c);
            }
            arena->Step(1);
            w.writeRow(arena, cars, cs);
        }
        printf("%-20s %d ticks, %d cars\n", sc.name.c_str(), sc.numTicks,
               sc.numCars);
        delete arena;
    }
    return 0;
}
