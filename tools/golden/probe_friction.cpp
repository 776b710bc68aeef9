// One-off probe: inspect btVehicleRL wheel worldTransform basis columns vs
// the chassis axes while steering, to settle what _UpdateWheels' latDir
// (Car.cpp:419, basis.getColumn(1)) actually is at runtime.
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

#include "RocketSim.h"

using namespace RocketSim;

int main() {
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

    Arena* arena = Arena::Create(GameMode::SOCCAR, {}, 120);
    Car* car = arena->AddCar(Team::BLUE);
    CarState cs = {};
    cs.pos = Vec(0, 0, 17.01f);
    cs.rotMat = RotMat::GetIdentity();
    cs.vel = Vec(1200, 0, 0);
    car->SetState(cs);
    BallState bs = {};
    bs.pos = Vec(3500, -3500, 93.15f);
    arena->ball->SetState(bs);

    CarControls ctl = {};
    ctl.throttle = 1;
    ctl.steer = 1;

    for (int t = 0; t < 30; t++) {
        car->controls = ctl;
        arena->Step(1);
    }

    CarState s = car->GetState();
    Vec f = s.rotMat.forward, r = s.rotMat.right, u = s.rotMat.up;
    printf("chassis fwd   %+.4f %+.4f %+.4f\n", f.x, f.y, f.z);
    printf("chassis right %+.4f %+.4f %+.4f\n", r.x, r.y, r.z);
    printf("chassis up    %+.4f %+.4f %+.4f\n", u.x, u.y, u.z);

    auto& veh = car->_bulletVehicle;
    for (int w = 0; w < 4; w++) {
        auto& wi = veh.m_wheelInfo[w];
        const btMatrix3x3& b = wi.m_worldTransform.getBasis();
        for (int c = 0; c < 3; c++) {
            btVector3 col = b.getColumn(c);
            printf("wheel %d col %d: %+.4f %+.4f %+.4f  (dot f %+.3f, r %+.3f, u %+.3f)\n",
                   w, c, col.x(), col.y(), col.z(),
                   col.dot(btVector3(f.x, f.y, f.z)),
                   col.dot(btVector3(r.x, r.y, r.z)),
                   col.dot(btVector3(u.x, u.y, u.z)));
        }
        printf("wheel %d steerAngle %.4f latF %.4f longF %.4f\n",
               w, wi.m_steerAngle, wi.m_latFriction, wi.m_longFriction);
    }
    return 0;
}
