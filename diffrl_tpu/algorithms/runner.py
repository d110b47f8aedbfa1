"""Algorithm runner — parity with rl_games' Runner
(/root/reference/externals/rl_games/rl_games/torch_runner.py:20-186):
maps ``params.algo.name`` to an agent factory and dispatches train/play.
"""

from __future__ import annotations

from typing import Any, Dict

from .bptt import BPTT
from .ppo import PPO
from .sac import SAC
from .shac import SHAC

_ALGOS = {
    "a2c_continuous": PPO,   # rl_games' name for continuous PPO
    "ppo": PPO,
    "sac": SAC,
    "shac": SHAC,
    "bptt": BPTT,
    "adam": BPTT,            # BPTT configs name their optimizer as the algo
    "gd": BPTT,
    "sgd": BPTT,
}


class Runner:
    def __init__(self):
        self.cfg: Dict[str, Any] = {}

    def load(self, cfg: Dict[str, Any]):
        self.cfg = cfg

    def run(self, args: Dict[str, Any]):
        algo_name = self.cfg["params"].get("algo", {}).get("name", "ppo")
        agent_cls = _ALGOS[algo_name.lower()]
        agent = agent_cls(self.cfg)
        if args.get("train", True):
            agent.train()
        else:
            agent.play(self.cfg)
        return agent
