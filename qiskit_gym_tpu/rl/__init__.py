"""On-device RL: rollout collection, PPO, AlphaZero/MCTS, solve, configs."""

from .configs import (
    EvalConfig,
    PPOConfig,
    AlphaZeroConfig,
    BasicPolicyConfig,
    Conv1dPolicyConfig,
    ALGORITHMS,
    POLICIES,
)
from .synthesis import RLSynthesis, gate_list_to_circuit
from .demos import fit_demos, generate_demos, plan_episode

__all__ = [
    "fit_demos",
    "generate_demos",
    "plan_episode",
    "EvalConfig",
    "PPOConfig",
    "AlphaZeroConfig",
    "BasicPolicyConfig",
    "Conv1dPolicyConfig",
    "ALGORITHMS",
    "POLICIES",
    "RLSynthesis",
    "gate_list_to_circuit",
]
