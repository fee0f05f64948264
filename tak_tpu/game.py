"""Host-side single-game facade over the vectorized engine.

Plays the role of the reference's `Game<N>` value type for interactive /
I/O-bound call sites (analysis REPL, protocol servers, tests): one position,
`play()` with PTN strings or `Move`s, canonical `possible_moves()`
enumeration (move_gen.rs ordering), TPS import/export.

The heavy lifting stays in `tak_tpu.engine.core.Engine` (jitted); this
wrapper only shuttles one state between host and device.
"""

from __future__ import annotations

import numpy as np

from .actions import Move, parse_move
from .engine.core import Engine, get_engine
from .types import ONGOING, GameState


class IllegalMove(ValueError):
    pass


class Game:
    def __init__(self, n: int, half_komi: int = 0, state: GameState | None = None):
        self.n = n
        self.engine: Engine = get_engine(n)
        self.state = state if state is not None else self.engine.initial(half_komi)

    @classmethod
    def with_komi(cls, n: int, komi: int) -> "Game":
        return cls(n, half_komi=2 * komi)

    @classmethod
    def from_ptn_moves(cls, n: int, moves, half_komi: int = 0) -> "Game":
        game = cls(n, half_komi)
        for m in moves:
            game.play(m)
        return game

    # -- queries -------------------------------------------------------------

    @property
    def ply(self) -> int:
        return int(self.state.ply)

    @property
    def to_move(self) -> int:
        return int(self.state.to_move)

    @property
    def result(self) -> int:
        return int(self.state.result)

    def compute_result(self) -> int:
        """Re-derive the result from the current state (pure, like game.rs:220)."""
        return int(self.engine.compute_result_1(self.state))

    def legal_mask(self) -> np.ndarray:
        return np.asarray(self.engine.legal_mask_1(self.state))

    def legal_actions(self) -> np.ndarray:
        """Legal action ids in the reference's possible_moves order."""
        mask = self.legal_mask()
        ids = np.nonzero(mask)[0]
        key = np.asarray(self.engine.tables.canon_key)[ids]
        return ids[np.argsort(key)]

    def possible_moves(self) -> list[Move]:
        return [self.engine.tables.action_to_move(a) for a in self.legal_actions()]

    # -- play ----------------------------------------------------------------

    def play_action(self, action: int, check: bool = True) -> None:
        if check:
            if self.result != ONGOING:
                raise IllegalMove("game is over")
            if not self.legal_mask()[action]:
                from .errors import diagnose

                move = self.engine.tables.action_to_move(action)
                why = diagnose(self, move)
                reason = f": {why.value}" if why else ""
                raise IllegalMove(f"illegal move {move}{reason}")
        self.state = self.engine.step_1(self.state, action)

    def play(self, move, check: bool = True) -> None:
        if isinstance(move, str):
            move = parse_move(move)
        if isinstance(move, Move):
            if not (0 <= move.row < self.n and 0 <= move.col < self.n):
                from .errors import PlayError

                raise IllegalMove(
                    f"illegal move {move}: {PlayError.OUT_OF_BOUNDS.value}"
                )
            move = self.engine.tables.move_to_action(move)
        self.play_action(int(move), check)

    def clone(self) -> "Game":
        return Game(self.n, state=self.state)

    def __str__(self) -> str:
        from .engine.tps import state_to_tps

        return state_to_tps(self.engine, self.state)
