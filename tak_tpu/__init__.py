"""tak_tpu: a TPU-native AlphaZero framework for the board game Tak.

Ground-up JAX/XLA redesign with the capability surface of the reference
Rust workspace (ViliamVadocz/tak): vectorized rules engine, batched
on-device MCTS, Flax ResNet policy/value networks, generational self-play
training, analysis tooling, and protocol adapters (TEI / playtak).
"""

from .game import Game  # noqa: F401
from .types import GameState  # noqa: F401

__version__ = "0.1.0"
