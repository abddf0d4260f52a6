"""AlphaZero — placeholder until the batched array-MCTS engine lands.

The PPO path is the round-1 end-to-end slice; AZ (batched MCTS self-play,
mcts_* eval presets, solve with num_mcts_searches) is the next milestone.
"""

from __future__ import annotations


class AZ:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "AlphaZero is not wired up yet in this build; use PPOConfig."
        )
