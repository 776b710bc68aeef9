"""Runnable RLBot deployment harness (VERDICT r1 missing #4).

Covers the full deploy path without the rlbot framework or a game:
  - mock packet stream -> RLBotBot.get_output end to end (tick-skip
    repeat + 1-tick inference offset, RLBotClient.cpp:105-146),
  - loopback TCP bot server (RLBotClient.cpp:148-157 analog): JSON
    packets over a socket -> action rows,
  - `python -m rlgymppo_cpp_tpu.deploy mock` CLI entry,
  - the bundled rlbot/ launcher configs are well-formed.
"""

import configparser
import os

import numpy as np
import pytest

from rlgymppo_cpp_tpu.deploy.rlbot_client import RLBotBot, RLBotParams
from rlgymppo_cpp_tpu.deploy.mock_packets import (
    make_packet_stream, make_packet, packet_to_json,
)
from rlgymppo_cpp_tpu.gym.obs import DefaultOBS
from rlgymppo_cpp_tpu.gym.actions import DiscreteAction

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow

RLBOT_DIR = os.path.join(os.path.dirname(__file__), "..",
                         "rlgymppo_cpp_tpu", "deploy", "rlbot")


def _params(port=0):
    return RLBotParams(
        port=port,
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        checkpoint_path="/nonexistent",   # random-init fallback
        obs_size=89,
        tick_skip=8,
    )


def test_mock_packet_drive():
    bot = RLBotBot("t", 0, 0, _params())
    actions = [np.asarray(bot.get_output(p))
               for p in make_packet_stream(40)]
    acts = np.stack(actions)
    assert acts.shape == (40, 8)
    assert np.isfinite(acts).all()
    # tick-skip repeat: with 1 tick per frame the action row changes at
    # most every tick_skip frames
    changes = (np.abs(np.diff(acts, axis=0)).sum(axis=1) > 0).sum()
    assert changes <= 40 // 8 + 2


def test_bot_server_loopback():
    from rlgymppo_cpp_tpu.deploy.bot_server import BotServer, BotClient

    server = BotServer(_params(port=0))
    port = server.server_address[1]
    server.serve_background()
    try:
        client = BotClient(port=port)
        assert client.request({"type": "ping"}) == {"pong": True}
        for i, packet in enumerate(make_packet_stream(10)):
            resp = client.get_action(packet_to_json(packet), index=0)
            assert "action" in resp, resp
            assert len(resp["action"]) == 8
            assert all(np.isfinite(resp["action"]))
        # error path stays connected
        assert "error" in client.request({"type": "nope"})
        client.close()
    finally:
        server.shutdown()
        server.server_close()


def test_deploy_cli_mock(capsys):
    from rlgymppo_cpp_tpu.deploy.__main__ import main
    rc = main(["mock", "--checkpoint", "/nonexistent", "--steps", "10"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mock drive OK: 10 frames" in out


def test_launcher_configs_wellformed():
    cfg = configparser.ConfigParser()
    cfg.read(os.path.join(RLBOT_DIR, "rlbot.cfg"))
    assert cfg["Match Configuration"]["num_participants"] == "2"
    assert cfg["Participant Configuration"][
        "participant_config_0"] == "tpu_agent.cfg"

    agent = configparser.ConfigParser()
    agent.read(os.path.join(RLBOT_DIR, "tpu_agent.cfg"))
    assert agent["Locations"]["python_file"] == "tpu_agent.py"
    assert os.path.exists(os.path.join(RLBOT_DIR, "tpu_agent.py"))
    assert os.path.exists(os.path.join(RLBOT_DIR, "appearance.cfg"))
