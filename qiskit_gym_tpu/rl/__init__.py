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

__all__ = [
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
