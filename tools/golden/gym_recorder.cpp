// Golden GYM-LAYER recorder: drives the reference RLGymSim_CPP Gym (compiled
// from /root/reference, read-only) through scripted episodes and dumps, per
// step, the full GameState plus the reference's obs vectors, reward outputs,
// parsed actions and terminal flag as raw float32 rows.
//
// Purpose (VERDICT r2 missing #1): the physics layer is pinned by golden
// traces; this pins the POLICY-INPUT AND REWARD INTERFACES — DefaultOBS float
// layout/coefs (DefaultOBS.cpp:20-56), DefaultOBSPadded slot semantics
// (DefaultOBSPadded.cpp:41-59), CommonRewards values (CommonRewards.cpp:9-42,
// CommonRewards.h), ZeroSumReward (ZeroSumReward.cpp:3-30), DiscreteAction
// table indexing (DiscreteAction.cpp:3-68) and terminal flags
// (NoTouchCondition.h:18-28, GoalScoreCondition.h:9-12).
//
// The replay side (tests/test_golden_gym.py) does NOT re-simulate physics: it
// reconstructs a GameState from each recorded row and runs the TPU build's
// obs/reward/terminal code on it, asserting near-exact equality. Physics
// parity is the separate golden-trace suite.
//
// Reference entry points exercised:
//   Gym::Reset/Step            (Gym.cpp:58-102)
//   Match::{BuildObservations,GetRewards,IsDone,ParseActions}  (Match.cpp)
//   GameState::UpdateFromArena (GameState.cpp:52-104)
//
// Trace format (little-endian; header int32, rows float32):
//   int32 magic 0x524D5947 ("GYMR"), version=1, numRows, numPlayers P,
//   obsSize, maxPlayers (0 = DefaultOBS, else DefaultOBSPadded), teamSize,
//   spawnOpponents, then P int32 team ids.
//   Rows of (158 + 61*P + P*obsSize)/...: see writeRow below. Reset rows
//   (is_reset=1) carry the post-reset GameState + obs, zero actions/rewards.
//
// Also writes gym_action_table.bin: int32 magic 'GACT', version, count=90,
// then 90x8 float32 parsed action rows (the whole DiscreteAction table).

#include <algorithm>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <functional>
#include <map>
#include <random>
#include <string>
#include <vector>

#include "RLGymSim_CPP/Gym.h"
#include "RLGymSim_CPP/Utils/OBSBuilders/DefaultOBS.h"
#include "RLGymSim_CPP/Utils/OBSBuilders/DefaultOBSPadded.h"
#include "RLGymSim_CPP/Utils/RewardFunctions/CommonRewards.h"
#include "RLGymSim_CPP/Utils/RewardFunctions/CombinedReward.h"
#include "RLGymSim_CPP/Utils/RewardFunctions/ZeroSumReward.h"
#include "RLGymSim_CPP/Utils/TerminalConditions/NoTouchCondition.h"
#include "RLGymSim_CPP/Utils/TerminalConditions/GoalScoreCondition.h"
#include "RLGymSim_CPP/Utils/ActionParsers/DiscreteAction.h"
#include "RLGymSim_CPP/Utils/StateSetters/StateSetter.h"

using namespace RocketSim;
using namespace RLGSC;

// ---------------------------------------------------------------- file io

struct RowWriter {
    FILE* f;
    explicit RowWriter(const std::string& path) {
        f = fopen(path.c_str(), "wb");
        if (!f) { perror("fopen"); exit(1); }
    }
    void i32(int32_t v) { fwrite(&v, 4, 1, f); }
    void put(float v) { fwrite(&v, 4, 1, f); }
    void putVec(const Vec& v) { put(v.x); put(v.y); put(v.z); }
    void putRot(const RotMat& m) {
        putVec(m.forward); putVec(m.right); putVec(m.up);
    }
    ~RowWriter() { fclose(f); }
};

static void writePhys(RowWriter& w, const PhysObj& p) {
    w.putVec(p.pos); w.putRot(p.rotMat); w.putVec(p.vel); w.putVec(p.angVel);
}

// One row: everything the replay side needs to rebuild the GameState and
// check obs/rewards/done against the recorded reference outputs.
static void writeRow(RowWriter& w, bool isReset, bool done,
                     const std::vector<int>& actionIdx,
                     const ActionSet& parsed, const GameState& gs,
                     const FList2& obs, const FList& rewards, int obsSize) {
    int P = (int)gs.players.size();
    w.put(isReset ? 1.f : 0.f);
    w.put(done ? 1.f : 0.f);
    for (int p = 0; p < P; p++)
        w.put(isReset ? 0.f : (float)actionIdx[p]);
    for (int p = 0; p < P; p++) {
        Action a = isReset ? Action{0, 0, 0, 0, 0, 0, 0, 0} : parsed[p];
        for (float v : a) w.put(v);
    }
    w.putVec(gs.ball.pos); w.putVec(gs.ball.vel); w.putVec(gs.ball.angVel);
    w.putVec(gs.ballInv.pos); w.putVec(gs.ballInv.vel);
    w.putVec(gs.ballInv.angVel);
    for (int p = 0; p < P; p++) {
        const PlayerData& pl = gs.players[p];
        writePhys(w, pl.phys);
        writePhys(w, pl.physInv);
        w.put(pl.boostFraction);
        w.put((float)pl.carState.isOnGround);
        w.put((float)pl.hasFlip);
        w.put((float)pl.hasJump);
        w.put((float)pl.carState.isDemoed);
        w.put((float)pl.ballTouchedStep);
        w.put((float)pl.ballTouchedTick);
        w.put((float)pl.matchGoals); w.put((float)pl.matchSaves);
        w.put((float)pl.matchAssists); w.put((float)pl.matchShots);
        w.put((float)pl.matchShotPasses); w.put((float)pl.matchBumps);
        w.put((float)pl.matchDemos); w.put((float)pl.boostPickups);
    }
    for (int i = 0; i < 34; i++) w.put((float)gs.boostPads[i]);
    for (int i = 0; i < 34; i++) w.put((float)gs.boostPadsInv[i]);
    for (int i = 0; i < 34; i++) w.put(gs.boostPadTimers[i]);
    for (int i = 0; i < 34; i++) w.put(gs.boostPadTimersInv[i]);
    w.put((float)gs.scoreLine[0]); w.put((float)gs.scoreLine[1]);
    for (int p = 0; p < P; p++) {
        if ((int)obs[p].size() != obsSize) {
            fprintf(stderr, "obs size mismatch: %d vs %d\n",
                    (int)obs[p].size(), obsSize);
            exit(1);
        }
        for (float v : obs[p]) w.put(v);
    }
    for (int p = 0; p < P; p++) w.put(isReset ? 0.f : rewards[p]);
}

// -------------------------------------------------------- scripted resets

// State setter cycling through hand-authored arrangements so episodes hit
// the interesting gym-layer paths: touches, shots/goals, demos, pad
// pickups, aerial states. (StateSetter.h:8-9 contract: apply to arena,
// return GameState.)
struct ScriptedStateSetter : public StateSetter {
    std::vector<std::function<void(Arena*)>> arrangements;
    int next = 0;
    GameState ResetState(Arena* arena) override {
        arrangements[next % arrangements.size()](arena);
        next++;
        return GameState(arena);
    }
};

static CarState carAt(Vec pos, float yaw = 0, Vec vel = {0, 0, 0},
                      float boost = 100.f / 3, float pitch = 0,
                      float roll = 0) {
    CarState cs = {};
    cs.pos = pos;
    cs.rotMat = Angle(yaw, pitch, roll).ToRotMat();
    cs.vel = vel;
    cs.boost = boost;
    cs.isOnGround = false;
    return cs;
}

static BallState ballAt(Vec pos, Vec vel = {0, 0, 0},
                        Vec angVel = {0, 0, 0}) {
    BallState bs = {};
    bs.pos = pos; bs.vel = vel; bs.angVel = angVel;
    return bs;
}

// Arena::_cars is an std::unordered_set — iteration order is arbitrary.
// Arrangements index this TEAM-SORTED list (blue first, then by id) so
// "cars[0] attacks +y" really is a BLUE car; otherwise scripted goals are
// own-goals, which GameEventTracker never credits (GetShooterPasser finds
// no scorer on the scoring team) and matchGoals/Shots/Saves stay zero.
static std::vector<Car*> carVec(Arena* a) {
    std::vector<Car*> cars(a->_cars.begin(), a->_cars.end());
    std::sort(cars.begin(), cars.end(), [](Car* x, Car* y) {
        if (x->team != y->team) return (int)x->team < (int)y->team;
        return x->id < y->id;
    });
    return cars;
}

// car 0 (BLUE) chasing a ball that is rolling toward the orange goal:
// touch -> shot -> goal -> GoalScoreCondition
static void ballIntoOrangeGoal(Arena* a) {
    auto cars = carVec(a);
    cars[0]->SetState(carAt({0, 2600, 17.01f}, (float)(M_PI / 2),
                            {0, 1500, 0}, 80));
    for (size_t i = 1; i < cars.size(); i++)
        cars[i]->SetState(carAt({(float)(900 * i), -3000, 17.01f},
                                (float)(-M_PI / 2)));
    a->ball->SetState(ballAt({0, 3200, 93.15f}, {0, 900, 0}));
}

// blue supersonic into a stationary orange car: bump + demo counters.
// NOTE a reference quirk (Gym.cpp:68-102): bump/demo callbacks firing
// during the trailing actionDelay ticks mutate the old prevState, which
// Gym::Step then overwrites — only contacts on the FIRST tick of a step
// ever reach the counters. Several demo arrangements are cycled so some
// land on the counted tick.
static void demoSetup(Arena* a) {
    auto cars = carVec(a);
    cars[0]->SetState(carAt({-1200, 0, 17.01f}, 0, {2250, 0, 0}, 100));
    if (cars.size() > 1)
        cars[1]->SetState(carAt({600, 0, 17.01f}, (float)M_PI));
    for (size_t i = 2; i < cars.size(); i++)
        cars[i]->SetState(carAt({(float)(-2500 + 800 * i), -3500, 17.01f},
                                (float)(M_PI / 2)));
    a->ball->SetState(ballAt({3500, 3500, 93.15f}));
}

// demo variants at different gaps so contacts sample different ticks
// within the 8-tick step window (see demoSetup note)
static std::function<void(Arena*)> demoAtGap(float gap) {
    return [gap](Arena* a) {
        auto cars = carVec(a);
        cars[0]->SetState(carAt({-gap, 100, 17.01f}, 0, {2295, 0, 0}, 100));
        if (cars.size() > 1)
            cars[1]->SetState(carAt({0, 100, 17.01f}, (float)M_PI));
        for (size_t i = 2; i < cars.size(); i++)
            cars[i]->SetState(
                carAt({(float)(-2500 + 800 * i), -3500, 17.01f},
                      (float)(M_PI / 2)));
        a->ball->SetState(ballAt({3500, 3500, 93.15f}));
    };
}

// slow attacker with little boost: bump WITHOUT demo (matchBumps only)
static void bumpSetup(Arena* a) {
    auto cars = carVec(a);
    cars[0]->SetState(carAt({-900, -200, 17.01f}, 0, {1000, 0, 0}, 4));
    if (cars.size() > 1)
        cars[1]->SetState(carAt({0, -200, 17.01f}, (float)M_PI, {0, 0, 0},
                                4));
    for (size_t i = 2; i < cars.size(); i++)
        cars[i]->SetState(carAt({(float)(-2500 + 800 * i), 3500, 17.01f},
                                (float)(-M_PI / 2)));
    a->ball->SetState(ballAt({3500, 3500, 93.15f}));
}

// low boost, driving across the small-pad row toward a big corner pad:
// boostFraction pickup deltas (EventReward boostPickup uses the FRACTION
// delta, CommonRewards.cpp:18)
static void padRow(Arena* a) {
    auto cars = carVec(a);
    cars[0]->SetState(carAt({-3000, -4000, 17.01f}, 0, {900, 0, 0}, 12));
    for (size_t i = 1; i < cars.size(); i++)
        cars[i]->SetState(carAt({(float)(800 * i), 3800, 17.01f},
                                (float)(-M_PI / 2), {0, 0, 0}, 8));
    a->ball->SetState(ballAt({0, 0, 93.15f}));
}

// airborne cars + ball: exercises hasFlip/hasJump=false-ish states, off-
// ground flags, aerial obs values
static void aerialState(Arena* a) {
    auto cars = carVec(a);
    float sign = 1;
    for (auto* c : cars) {
        c->SetState(carAt({sign * 1100, sign * 800, 900}, 0.7f * sign,
                          {sign * 300, 200, 450}, 55, 0.4f, 0.1f));
        sign = -sign;
    }
    a->ball->SetState(ballAt({0, -1000, 1200}, {200, -300, 300},
                             {1, 2, -1}));
}

// ORANGE shooter rams a ball toward the blue net (registers a SHOT:
// GameEventTracker needs a touch >=0.3s before the going-in prediction,
// GameEventTracker.cpp:84-115); BLUE defender in the net mouth deflects
// it -> SAVE credited to the defender (goal-team car touch while the
// shot stops going in, GameEventTracker.cpp:119-141).
static void saveSetup(Arena* a) {
    auto cars = carVec(a);
    cars[0]->SetState(carAt({0, -4900, 17.01f}, (float)(M_PI / 2)));
    size_t half = cars.size() / 2;  // first orange car in team-sorted order
    // shooter only grazes the already-rolling ball (small closing speed)
    // so the shot stays LOW — a chipped ball sails over the defender's
    // reach (hitbox top ~38 uu + ball radius) and scores instead
    if (cars.size() > 1)
        cars[half]->SetState(carAt({0, -1950, 17.01f}, (float)(-M_PI / 2),
                                   {0, -2295, 0}, 100));
    for (size_t i = 1; i < cars.size(); i++) {
        if (i == half) continue;
        cars[i]->SetState(carAt({(float)(1000 * i), 2800, 17.01f}, 0));
    }
    a->ball->SetState(ballAt({0, -2200, 93.15f}, {0, -2150, 0}));
}

// two BLUE cars staggered behind the ball near the orange goal: the near
// one touches first (passer), the boosted far one catches up, touches
// later and scores (shooter) -> goal + ASSIST (GetShooterPasser picks the
// latest toucher as shooter, earlier same-team toucher within 2s as
// passer, GameEventTracker.cpp:5-46). Needs teamSize >= 2.
static void assistSetup(Arena* a) {
    auto cars = carVec(a);
    // two sequential GRAZES on a fast-rolling ball: the boostless passer
    // nudges it once and falls behind (throttle tops out ~1410 < ball),
    // the boosted shooter overtakes ~1.5s later, grazes it again and it
    // rolls in -> scorer=shooter, passer=passer (within the 2s window)
    cars[0]->SetState(carAt({0, 820, 17.01f}, (float)(M_PI / 2),
                            {0, 1500, 0}, 0));
    cars[1]->SetState(carAt({-150, -200, 17.01f}, (float)(M_PI / 2),
                            {0, 2295, 0}, 100));
    size_t half = cars.size() / 2;
    for (size_t i = half; i < cars.size(); i++)
        cars[i]->SetState(carAt({(float)(900 * (i - half + 1)), -3600,
                                 17.01f}, (float)(-M_PI / 2)));
    a->ball->SetState(ballAt({0, 1000, 93.15f}, {0, 1200, 0}));
}

// ----------------------------------------------------------------- driver

struct GymScenario {
    std::string name;
    int teamSize;
    bool spawnOpponents;
    int maxPlayers;  // 0 -> DefaultOBS, else DefaultOBSPadded(maxPlayers)
    std::function<RewardFunction*()> makeReward;
    int numSteps;
    uint32_t seed;
    // empty -> default arrangement cycle
    std::vector<std::function<void(Arena*)>> arrangements;
};

static void runScenario(const GymScenario& sc, const std::string& outDir) {
    OBSBuilder* obsBuilder = sc.maxPlayers
        ? (OBSBuilder*)new DefaultOBSPadded(sc.maxPlayers)
        : (OBSBuilder*)new DefaultOBS();
    auto* parser = new DiscreteAction();
    auto* setter = new ScriptedStateSetter();
    setter->arrangements = sc.arrangements.empty()
        ? std::vector<std::function<void(Arena*)>>{
              ballIntoOrangeGoal, padRow, demoSetup, aerialState, saveSetup}
        : sc.arrangements;
    auto* noTouch = new NoTouchCondition(40);
    auto* goal = new GoalScoreCondition();
    RewardFunction* reward = sc.makeReward();

    Match match(reward, {noTouch, goal}, obsBuilder, parser, setter,
                sc.teamSize, sc.spawnOpponents);
    Gym gym(&match, 8);
    int P = match.playerAmount;

    // obs size probe like Learner.cpp:99-109
    FList2 obs0 = gym.Reset();
    int obsSize = (int)obs0[0].size();

    RowWriter w(outDir + "/" + sc.name + ".bin");
    w.i32(0x524D5947); w.i32(1);
    // numRows = steps + reset rows; patched after? Keep exact: count first.
    // Rows are fixed-size, so the converter could derive the count, but an
    // explicit header keeps parsing dumb. Steps + one reset row per episode
    // isn't known upfront -> write a placeholder and patch at the end.
    long numRowsPos = ftell(w.f);
    w.i32(-1);
    w.i32(P); w.i32(obsSize); w.i32(sc.maxPlayers); w.i32(sc.teamSize);
    w.i32(sc.spawnOpponents ? 1 : 0);
    for (auto& pl : gym.prevState.players) w.i32((int)pl.team);

    std::mt19937 rng(sc.seed);
    std::uniform_int_distribution<int> anyAction(0, 89);

    // find a "drive forward + boost, no turn" table index so cars chase
    // whatever is in front of them between random segments
    int idxForwardBoost = 0;
    {
        GameState& st = gym.prevState;
        for (int i = 0; i < 90; i++) {
            ActionSet a = parser->ParseActions(IList{i}, st);
            const Action& x = a[0];
            if (x.throttle == 1 && x.steer == 0 && x.pitch == 0 &&
                x.yaw == 0 && x.roll == 0 && x.jump == 0 && x.boost == 1 &&
                x.handbrake == 0) { idxForwardBoost = i; break; }
        }
    }

    int rows = 0;
    // reset row: post-reset GameState + obs (zero prevActions, Match::
    // EpisodeReset) so the replay side can seed EventReward carries
    writeRow(w, true, false, {}, {}, gym.prevState, obs0, {}, obsSize);
    rows++;

    int stepsSinceReset = 0;
    for (int t = 0; t < sc.numSteps; t++) {
        // Deterministic chase phase right after every reset so the
        // arrangements actually produce events (touch/shot/goal/demo);
        // then mixed random for state-space coverage.
        bool chase = stepsSinceReset < 25;
        std::vector<int> idx(P);
        for (int p = 0; p < P; p++)
            idx[p] = (chase || (rng() % 2)) ? idxForwardBoost
                                            : anyAction(rng);
        // parse exactly like Gym::Step will (demoed cars zeroed,
        // Match.cpp:44-52) for the recorded parsed-action rows
        ActionSet parsed = match.ParseActions(IList(idx.begin(), idx.end()),
                                              gym.prevState);
        auto res = gym.Step(IList(idx.begin(), idx.end()));
        writeRow(w, false, res.done, idx, parsed, res.state, res.obs,
                 res.reward, obsSize);
        rows++;
        stepsSinceReset++;
        if (res.done) {
            FList2 obsR = gym.Reset();
            writeRow(w, true, false, {}, {}, gym.prevState, obsR, {},
                     obsSize);
            rows++;
            stepsSinceReset = 0;
        }
    }
    fseek(w.f, numRowsPos, SEEK_SET);
    int32_t n = rows;
    fwrite(&n, 4, 1, w.f);
    fseek(w.f, 0, SEEK_END);
    printf("%s: %d rows, P=%d, obsSize=%d\n", sc.name.c_str(), rows, P,
           obsSize);
}

int main(int argc, char** argv) {
    std::string outDir = argc > 1 ? argv[1] : "traces";

    // Minimal valid .cmf (one triangle flush in a far ceiling corner):
    // physics runs on the arena's analytic planes; the gym layer being
    // recorded is independent of which static world the arena uses.
    {
        struct __attribute__((packed)) {
            int32_t numTris = 1, numVerts = 3;
            int32_t tri[3] = {0, 1, 2};
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
        RocketSim::InitFromMem(files, true);
    }

    // dump the whole DiscreteAction table (DiscreteAction.cpp:3-68)
    {
        DiscreteAction parser;
        RowWriter w(outDir + "/gym_action_table.bin");
        w.i32(0x54434147); w.i32(1); w.i32(parser.GetActionAmount());
        for (const Action& a : parser.actions)
            for (float v : a) w.put(v);
        printf("gym_action_table: %d actions\n", parser.GetActionAmount());
    }

    std::vector<GymScenario> scenarios = {
        // stateless reward suite + DefaultOBS float layout, 1v1
        {"gym_1v1_stateless", 1, true, 0, []() -> RewardFunction* {
             return new CombinedReward({
                 {new VelocityPlayerToBallReward(), 1.0f},
                 {new FaceBallReward(), 0.25f},
                 {new VelocityBallToGoalReward(), 0.5f},
                 {new VelocityBallToGoalReward(true), 0.3f},
                 {new SaveBoostReward(), 0.125f},
                 {new VelocityReward(), 0.0625f},
                 {new TouchBallReward(0.2f), 2.0f},
             });
         }, 350, 101},
        // EventReward deltas incl. negative weights + boostFraction
        // pickups, 1v1 (CommonRewards.cpp:9-42)
        {"gym_1v1_event", 1, true, 0, []() -> RewardFunction* {
             EventReward::WeightScales ws = {};
             ws.goal = 1; ws.teamGoal = 2; ws.concede = -4; ws.assist = 8;
             ws.touch = 16; ws.shot = 32; ws.shotPass = 64; ws.save = 128;
             ws.demo = 256; ws.demoed = -512; ws.boostPickup = 1024;
             return new EventReward(ws);
         }, 800, 202,
         // demo gaps step by ~19 uu (one tick of supersonic travel) so the
         // car-car contact tick sweeps all 8 phases of the step window —
         // only contacts on the step's FIRST tick reach the counters (see
         // demoSetup note)
         {ballIntoOrangeGoal, demoAtGap(600), saveSetup, demoAtGap(619),
          padRow, demoAtGap(638), bumpSetup, demoAtGap(657), saveSetup,
          demoAtGap(676), demoAtGap(695), demoAtGap(714), demoAtGap(733)}},
        // ZeroSum(Combined(...)) + DefaultOBSPadded slot semantics, 2v2
        {"gym_2v2_padded_zerosum", 2, true, 3, []() -> RewardFunction* {
             EventReward::WeightScales ws = {};
             ws.touch = 5; ws.goal = 10;
             return new ZeroSumReward(
                 new CombinedReward({
                     {new VelocityPlayerToBallReward(), 1.0f},
                     {new FaceBallReward(), 0.5f},
                     {new EventReward(ws), 1.0f},
                 }),
                 0.3f, 0.7f);
         }, 250, 303,
         {ballIntoOrangeGoal, assistSetup, padRow, saveSetup, aerialState,
          assistSetup}},
        // 3v3 padding: 2 real + 1 pad teammate slots, 3 real + 1 pad
        // opponent slots (DefaultOBSPadded.cpp:41-59)
        {"gym_3v3_padded", 3, true, 4, []() -> RewardFunction* {
             return new CombinedReward(
                 {{new VelocityPlayerToBallReward(), 1.0f}});
         }, 120, 404},
    };

    for (auto& sc : scenarios) runScenario(sc, outDir);
    return 0;
}
