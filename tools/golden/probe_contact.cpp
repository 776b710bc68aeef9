// Empirical car-ball contact-surface probe for the reference engine.
//
// Two measurements against the compiled reference (RocketSim + bullet):
//
// 1. STATIC reach: bisect, per approach direction, the largest
//    car-center..ball-center distance at which one Arena::Step produces a
//    positional push-out of the ball. Detection is positional, not
//    velocity: RocketSim forces split-impulse (Arena.cpp:485-488), so a
//    zero-relative-velocity overlap changes positions only. Result
//    (octane, soccar ball): every face reports contact at the CONFIGURED
//    hitbox surface + ~1.1 uu; the top corner at +0.67 uu — i.e. bullet's
//    manifold forms at implicit-box + margin + breaking-threshold slop.
//
// 2. DYNAMIC bounce: zero-gravity ball fired at the nose; report the
//    start-of-tick gap on the tick the velocity impulse fires. Result:
//    impulses fire at gaps of −1 .. +3 uu around the configured surface
//    depending on speed — bullet's solver gives separated manifold points
//    a gap/dt velocity allowance, softening contact onset over ~1 tick.
//
// Together these justify the engine's sharp-box contact model
// (configured/2 + margins, sim/core_collisions.py) over the smaller
// "effective" bullet box, while inertia uses the effective box
// (sim/car_config.py:bullet_effective_half_extents).
//
// Build: tools/golden/CMakeLists.txt. Run with no args.
#include <cstdio>
#include <cstring>
#include <cmath>
#include <map>
#include <vector>

#include "RocketSim.h"

using namespace RocketSim;

static const float R = 91.25f;   // RLConst::BALL_COLLISION_RADIUS_SOCCAR
// octane hitbox 118.0074 x 84.1994 x 36.1590, offset (13.8757, 0, 20.755)
static const float HX = 118.0074f / 2, HY = 84.1994f / 2, HZ = 36.159f / 2;
static const float OX = 13.8757f, OZ = 20.755f;

static void initRS() {
    struct __attribute__((packed)) {
        int32_t numTris = 1, numVerts = 3;
        int32_t tri[3] = {0, 1, 2};
        float verts[9] = {
            4090.f, -5115.f, 2043.f,
            4095.f, -5115.f, 2043.f,
            4095.f, -5110.f, 2043.f,
        };
    } cmf;
    std::vector<char> bytes(sizeof(cmf));
    memcpy(bytes.data(), &cmf, sizeof(cmf));
    std::map<GameMode, std::vector<FileData>> files;
    files[GameMode::SOCCAR].push_back(FileData(bytes.begin(), bytes.end()));
    RocketSim::InitFromMem(files, true);
}

// One tick, mid-air car, ball offset from car center by `ballOff`.
// Returns true if the ball's position deviated from free fall (split
// impulse push-out => overlap within bullet's manifold reach).
static bool contacts(Vec ballOff) {
    Arena* a = Arena::Create(GameMode::SOCCAR);
    a->AddCar(Team::BLUE);
    Car* car = *a->GetCars().begin();
    CarState cs = {};
    cs.pos = Vec(0, 0, 1000);
    cs.rotMat = Angle(0, 0, 0).ToRotMat();
    cs.isOnGround = false;
    car->SetState(cs);
    BallState bs = {};
    bs.pos = cs.pos + ballOff;
    // tiny nonzero velocity defeats zero-velocity ball sleep
    // (Arena.cpp:721-727) so gravity integrates normally when no contact
    bs.vel = Vec(0, 0, -0.01f);
    a->ball->SetState(bs);
    a->Step(1);
    BallState nb = a->ball->GetState();
    float dt = 1.f / 120.f;
    float vz = (-0.01f - 650.f * dt) * (1.f - 0.03f * dt);
    Vec exp = bs.pos + Vec(0, 0, vz * dt);
    float err = std::fabs(nb.pos.x - exp.x) + std::fabs(nb.pos.y - exp.y)
              + std::fabs(nb.pos.z - exp.z);
    delete a;
    return err > 0.02f;
}

static float bisect(Vec d, float lo, float hi) {
    for (int i = 0; i < 40; i++) {
        float mid = 0.5f * (lo + hi);
        if (contacts(Vec(d.x * mid, d.y * mid, d.z * mid)))
            lo = mid;
        else
            hi = mid;
    }
    return 0.5f * (lo + hi);
}

int main() {
    initRS();

    printf("== static manifold reach (positional push-out) ==\n");
    struct Probe { const char* name; Vec dir; float surf; };
    std::vector<Probe> probes = {
        {"nose(+x)", Vec(1, 0, 0), OX + HX + R},
        {"side(+y)", Vec(0, 1, 0), HY + R},
        {"roof(+z)", Vec(0, 0, 1), OZ + HZ + R},
        {"floor(-z)", Vec(0, 0, -1), R - (OZ - HZ)},
    };
    for (auto& p : probes) {
        float d = bisect(p.dir, p.surf - 15.f, p.surf + 15.f);
        printf("%-10s center-dist %.4f  configured %.4f  delta %+.4f uu\n",
               p.name, d, p.surf, d - p.surf);
    }
    {
        Vec corner(OX + HX, HY, OZ + HZ);
        Vec dn(1 / std::sqrt(3.f), 1 / std::sqrt(3.f), 1 / std::sqrt(3.f));
        float clen = std::sqrt(corner.x * corner.x + corner.y * corner.y +
                               corner.z * corner.z);
        float lo = clen - 40, hi = clen + R + 40;
        for (int i = 0; i < 40; i++) {
            float mid = 0.5f * (lo + hi);
            if (contacts(Vec(dn.x * mid, dn.y * mid, dn.z * mid)))
                lo = mid;
            else
                hi = mid;
        }
        float reach = 0.5f * (lo + hi);
        Vec bc(dn.x * reach - corner.x, dn.y * reach - corner.y,
               dn.z * reach - corner.z);
        float cr = std::sqrt(bc.x * bc.x + bc.y * bc.y + bc.z * bc.z);
        printf("%-10s corner->ballcenter %.4f  (R=%.2f, delta %+.4f uu)\n",
               "corner", cr, R, cr - R);
    }

    printf("== dynamic bounce onset (zero gravity, ball at nose) ==\n");
    for (float speed : {120.f, 300.f, 600.f, 1200.f, 2400.f}) {
        Arena* a = Arena::Create(GameMode::SOCCAR);
        MutatorConfig mc = a->GetMutatorConfig();
        mc.gravity = Vec(0, 0, 0);
        mc.ballDrag = 0;
        a->SetMutatorConfig(mc);
        a->AddCar(Team::BLUE);
        Car* car = *a->GetCars().begin();
        CarState cs = {};
        cs.pos = Vec(0, 0, 1000);
        cs.rotMat = Angle(0, 0, 0).ToRotMat();
        cs.isOnGround = false;
        car->SetState(cs);
        float surf = OX + HX;
        BallState bs = {};
        bs.pos = Vec(1000 + surf + R + 57.3f, 0, 1000);
        bs.vel = Vec(-speed, 0, 0);
        a->ball->SetState(bs);
        float prevx = bs.pos.x, prevvx = bs.vel.x;
        for (int t = 0; t < 1200; t++) {
            a->Step(1);
            BallState nb = a->ball->GetState();
            CarState nc = car->GetState();
            if (std::fabs(nb.vel.x - prevvx) > 0.5f) {
                printf("speed %6.0f: impulse tick %4d  start-gap %9.4f "
                       "(%.2f uu/tick)  vx %9.2f -> %9.2f\n",
                       speed, t, (prevx - nc.pos.x) - surf - R,
                       speed / 120, prevvx, nb.vel.x);
                break;
            }
            prevx = nb.pos.x;
            prevvx = nb.vel.x;
        }
        delete a;
    }
    return 0;
}
