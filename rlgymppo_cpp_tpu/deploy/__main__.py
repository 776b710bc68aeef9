"""Deployment entry: `python -m rlgymppo_cpp_tpu.deploy <mode>`.

Modes (analog of the reference's rlbot/run.sh + RLBotClient::Run):

  launch  start an RLBot match with the bundled rlbot.cfg (requires the
          rlbot framework + Rocket League; deployment machine only)
  serve   start the localhost bot server (deploy/bot_server.py) — the
          RLBotClient.cpp:148-157 analog; any client can stream
          GameTickPacket JSON and get actions back
  mock    drive RLBotBot end-to-end against a synthetic packet stream
          (no rlbot dependency; smoke-tests the full deploy path)
"""

import argparse
import os
import sys


def _params(args):
    from rlgymppo_cpp_tpu.deploy.rlbot_client import RLBotParams
    from rlgymppo_cpp_tpu.gym.obs import DefaultOBS
    from rlgymppo_cpp_tpu.gym.actions import DiscreteAction
    return RLBotParams(
        port=args.port,
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        checkpoint_path=args.checkpoint,
        obs_size=args.obs_size,
        tick_skip=args.tick_skip,
        deterministic=not args.stochastic,
    )


def cmd_launch(args):
    try:
        from rlbot import runner
    except ImportError:
        print("The rlbot framework is not installed. On the deployment "
              "machine: pip install rlbot, then re-run. (Training "
              "containers don't need it; use `mock` or `serve` here.)")
        return 1
    os.chdir(os.path.join(os.path.dirname(__file__), "rlbot"))
    runner.main()
    return 0


def cmd_serve(args):
    from rlgymppo_cpp_tpu.deploy.bot_server import BotServer
    server = BotServer(_params(args))
    print(f"bot server listening on 127.0.0.1:{args.port} "
          f"(checkpoint: {args.checkpoint})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_mock(args):
    import numpy as np
    from rlgymppo_cpp_tpu.deploy.rlbot_client import RLBotBot
    from rlgymppo_cpp_tpu.deploy.mock_packets import make_packet_stream

    bot = RLBotBot("mock", 0, 0, _params(args))
    actions = []
    for packet in make_packet_stream(args.steps, num_cars=2):
        actions.append(np.asarray(bot.get_output(packet)))
    acts = np.stack(actions)
    print(f"mock drive OK: {len(actions)} frames, "
          f"action range [{acts.min():.2f}, {acts.max():.2f}], "
          f"distinct action rows: {len(np.unique(acts, axis=0))}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m rlgymppo_cpp_tpu.deploy")
    ap.add_argument("mode", choices=["launch", "serve", "mock"],
                    nargs="?", default="launch")
    ap.add_argument("--checkpoint", default="checkpoints")
    ap.add_argument("--port", type=int, default=23234)
    ap.add_argument("--obs-size", type=int, default=89)
    ap.add_argument("--tick-skip", type=int, default=8)
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args(argv)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    return {"launch": cmd_launch, "serve": cmd_serve,
            "mock": cmd_mock}[args.mode](args)


if __name__ == "__main__":
    raise SystemExit(main())
