// Diagnostic: why don't goal/shot/save events fire in the gym recorder's
// scripted scenarios? Drives the reference Gym through ballIntoOrangeGoal
// and prints per-step ball pos, ballHitInfo, and every event callback.
#include <cstdio>
#include <cmath>
#include <functional>
#include <map>
#include <vector>
#include <cstring>

#include "RLGymSim_CPP/Gym.h"
#include "RLGymSim_CPP/Utils/OBSBuilders/DefaultOBS.h"
#include "RLGymSim_CPP/Utils/RewardFunctions/CommonRewards.h"
#include "RLGymSim_CPP/Utils/TerminalConditions/NoTouchCondition.h"
#include "RLGymSim_CPP/Utils/TerminalConditions/GoalScoreCondition.h"
#include "RLGymSim_CPP/Utils/ActionParsers/DiscreteAction.h"
#include "RLGymSim_CPP/Utils/StateSetters/StateSetter.h"

using namespace RocketSim;
using namespace RLGSC;

namespace RocketSim {
bool GetShooterPasser(Arena* arena, Team team, Car*& shooterOut,
                      bool findPasser, Car*& passerOut,
                      uint64_t maxShooterTicks, uint64_t maxPasserTicks);
}

struct OneSetter : public StateSetter {
    GameState ResetState(Arena* a) override {
        auto cars = std::vector<Car*>(a->_cars.begin(), a->_cars.end());
        CarState cs = {};
        cs.pos = {0, 2600, 17.01f};
        cs.rotMat = Angle(M_PI / 2, 0, 0).ToRotMat();
        cs.vel = {0, 1500, 0};
        cs.boost = 80;
        cars[0]->SetState(cs);
        CarState cs2 = {};
        cs2.pos = {900, -3000, 17.01f};
        cs2.rotMat = Angle(-M_PI / 2, 0, 0).ToRotMat();
        cars[1]->SetState(cs2);
        BallState bs = {};
        bs.pos = {0, 3200, 93.15f};
        bs.vel = {0, 900, 0};
        a->ball->SetState(bs);
        return GameState(a);
    }
};

int main() {
    {
        struct __attribute__((packed)) {
            int32_t numTris = 1, numVerts = 3;
            int32_t tri[3] = {0, 1, 2};
            float verts[9] = {81.8f, -102.3f, 40.86f, 81.9f, -102.3f, 40.86f,
                              81.9f, -102.2f, 40.86f};
        } cmf;
        std::vector<char> bytes(sizeof(cmf));
        memcpy(bytes.data(), &cmf, sizeof(cmf));
        std::map<GameMode, std::vector<FileData>> files;
        files[GameMode::SOCCAR].push_back(FileData(bytes.begin(), bytes.end()));
        RocketSim::InitFromMem(files, true);
    }

    Match match(new VelocityPlayerToBallReward(),
                {new NoTouchCondition(40), new GoalScoreCondition()},
                new DefaultOBS(), new DiscreteAction(), new OneSetter(), 1,
                true);
    Gym gym(&match, 8);

    // instrument: extra goal callback printing (arena-level bump cb is taken
    // by Gym; use the tracker's callbacks via gym.eventTracker)
    gym.eventTracker.SetGoalCallback(
        [](Arena*, Car* scorer, Car* passer, void*) {
            printf("  >> GOAL callback scorer=%u passer=%u\n",
                   scorer ? scorer->id : 0, passer ? passer->id : 0);
        },
        nullptr);
    gym.eventTracker.SetShotCallback(
        [](Arena*, Car* shooter, Car* passer, void*) {
            printf("  >> SHOT callback shooter=%u\n",
                   shooter ? shooter->id : 0);
        },
        nullptr);

    gym.Reset();
    // find forward+boost
    DiscreteAction parser;
    int fb = 0;
    for (int i = 0; i < 90; i++) {
        ActionSet a = parser.ParseActions(IList{i}, gym.prevState);
        const Action& x = a[0];
        if (x.throttle == 1 && x.steer == 0 && x.boost == 1 && x.jump == 0 &&
            x.pitch == 0 && x.yaw == 0 && x.roll == 0 && x.handbrake == 0) {
            fb = i;
            break;
        }
    }
    for (int t = 0; t < 30; t++) {
        auto res = gym.Step({fb, fb});
        auto& pl = res.state.players[0];
        auto& hit = pl.carState.ballHitInfo;
        printf(
            "t=%2d ball=(%.0f,%.0f,%.0f) v=(%.0f,%.0f,%.0f) done=%d "
            "hitValid=%d hitTick=%llu arenaTick=%llu goals=%d shots=%d "
            "touchStep=%d score=%d-%d\n",
            t, res.state.ball.pos.x, res.state.ball.pos.y,
            res.state.ball.pos.z, res.state.ball.vel.x, res.state.ball.vel.y,
            res.state.ball.vel.z, (int)res.done, (int)hit.isValid,
            (unsigned long long)hit.tickCountWhenHit,
            (unsigned long long)gym.arena->tickCount, pl.matchGoals,
            pl.matchShots, (int)pl.ballTouchedStep, res.state.scoreLine[0],
            res.state.scoreLine[1]);
        {
            Arena* a = gym.arena;
            Team goalTeam;
            bool goingIn = a->IsBallProbablyGoingIn(2.0f, 0, &goalTeam);
            float speed =
                (a->ball->_rigidBody.m_linearVelocity * BT_TO_UU).length();
            Car* shooter;
            Car* passer;
            bool found =
                goingIn &&
                GetShooterPasser(a, RS_OPPOSITE_TEAM(goalTeam), shooter, true,
                                 passer, 8 + 36, 2.0f * 120);
            printf(
                "      manual: goingIn=%d goalTeam=%d speed=%.0f found=%d "
                "tick=%llu\n",
                (int)goingIn, goingIn ? (int)goalTeam : -1, speed, (int)found,
                (unsigned long long)a->tickCount);
            for (Car* c : a->_cars)
                printf("      car id=%u team=%d hitValid=%d hitTick=%llu\n",
                       c->id, (int)c->team,
                       (int)c->_internalState.ballHitInfo.isValid,
                       (unsigned long long)
                           c->_internalState.ballHitInfo.tickCountWhenHit);
        }
        printf(
            "      tracker: lastBallUpd=%llu ballUpd=%llu scoredNow=%d "
            "scoredLast=%d ballShot=%d cooldown=%.2f goingIn=%d\n",
            (unsigned long long)gym.eventTracker._lastBallUpdateCount,
            (unsigned long long)gym.arena->ball->_internalState.updateCounter,
            (int)gym.arena->IsBallScored(),
            (int)gym.eventTracker._ballScoredLast,
            (int)gym.eventTracker._ballShot, gym.eventTracker._shotCooldown,
            (int)gym.arena->IsBallProbablyGoingIn(2.0f));
        if (res.done) {
            gym.Reset();
            printf("-- reset --\n");
        }
    }
    return 0;
}
