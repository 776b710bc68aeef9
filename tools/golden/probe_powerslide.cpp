// Per-tick wheel/friction internals dump from the compiled reference engine,
// for differential debugging of the powerslide yaw drift against the
// TPU-native engine (tools/golden/friction_diff.py).
//
// Replays the golden `powerslide` scenario (recorder.cpp) and after every
// Arena::Step(1) prints the car state plus, per wheel, every intermediate of
// btVehicleRL::updateVehicleFirst/Second (btVehicleRL.cpp:118-212, 277-310,
// 313-402) and Car::_UpdateWheels' output scalars (Car.cpp:330-475).
//
// Output: one "tick" line then four "wheel" lines per tick, whitespace-
// separated floats, parsed by friction_diff.py.
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#include "RocketSim.h"

using namespace RocketSim;

static void dump(Arena* arena, Car* car, int tick) {
    CarState s = car->GetState();
    printf("tick %d pos %.9g %.9g %.9g fwd %.9g %.9g %.9g right %.9g %.9g %.9g "
           "up %.9g %.9g %.9g vel %.9g %.9g %.9g ang %.9g %.9g %.9g hb %.9g\n",
           tick, s.pos.x, s.pos.y, s.pos.z,
           s.rotMat.forward.x, s.rotMat.forward.y, s.rotMat.forward.z,
           s.rotMat.right.x, s.rotMat.right.y, s.rotMat.right.z,
           s.rotMat.up.x, s.rotMat.up.y, s.rotMat.up.z,
           s.vel.x, s.vel.y, s.vel.z,
           s.angVel.x, s.angVel.y, s.angVel.z,
           s.handbrakeVal);
    auto& veh = car->_bulletVehicle;
    for (int w = 0; w < 4; w++) {
        auto& wi = veh.m_wheelInfo[w];
        auto& ri = wi.m_raycastInfo;
        printf("wheel %d contact %d suspLen %.9g suspRelVel %.9g clippedInv %.9g "
               "suspForce %.9g extraPb %.9g steer %.9g engine %.9g brake %.9g "
               "latF %.9g longF %.9g impulse %.9g %.9g %.9g "
               "cn %.9g %.9g %.9g cp %.9g %.9g %.9g\n",
               w, (int)ri.m_isInContact,
               ri.m_suspensionLength, wi.m_suspensionRelativeVelocity,
               wi.m_clippedInvContactDotSuspension,
               wi.m_wheelsSuspensionForce, wi.m_extraPushback,
               wi.m_steerAngle, wi.m_engineForce, wi.m_brake,
               wi.m_latFriction, wi.m_longFriction,
               wi.m_impulse.x(), wi.m_impulse.y(), wi.m_impulse.z(),
               ri.m_contactNormalWS.x(), ri.m_contactNormalWS.y(),
               ri.m_contactNormalWS.z(),
               ri.m_contactPointWS.x(), ri.m_contactPointWS.y(),
               ri.m_contactPointWS.z());
    }
}

int main(int argc, char** argv) {
    {
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

    // Scenario selection: default `powerslide`, or `drive_steer` via argv[1].
    std::string which = argc > 1 ? argv[1] : "powerslide";

    Arena* arena = Arena::Create(GameMode::SOCCAR, {}, 120);
    Car* car = arena->AddCar(Team::BLUE);
    CarState cs = {};
    cs.boost = 100.f / 3;
    CarControls ctl = {};
    int ticks = 300;
    if (which == "powerslide") {
        cs.pos = Vec(-1000, -1000, 17.01f);
        cs.rotMat = Angle(0, 0, 0).ToRotMat();
        cs.vel = Vec(1400, 0, 0);
        ctl.throttle = 1; ctl.steer = 1; ctl.handbrake = true;
    } else if (which == "drive_steer") {
        cs.pos = Vec(0, -2000, 17.01f);
        cs.rotMat = Angle(0, 0, 0).ToRotMat();
        ctl.throttle = 1; ctl.steer = 1;
        ticks = 400;
    } else {
        fprintf(stderr, "unknown scenario %s\n", which.c_str());
        return 1;
    }
    car->SetState(cs);
    BallState bs = {};
    bs.pos = Vec(3500, -3500, 93.15f);
    arena->ball->SetState(bs);

    {
        btVector3 ii = car->_rigidBody.getInvInertiaDiagLocal();
        printf("# invInertiaDiagLocal %.9g %.9g %.9g mass %.9g\n",
               ii.x(), ii.y(), ii.z(), 1.0f / car->_rigidBody.getInvMass());
    }
    dump(arena, car, 0);
    for (int t = 1; t <= ticks; t++) {
        car->controls = ctl;
        arena->Step(1);
        dump(arena, car, t);
    }
    return 0;
}
