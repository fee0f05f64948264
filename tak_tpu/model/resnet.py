"""Flax ResNet policy/value tower for Tak.

TPU-native equivalent of the reference's libtorch nets
(`alpha-tak/src/model/net5.rs`, `net6.rs`, `res_block.rs`):

  stem: 3x3 conv (input_channels -> filters) + BN + ReLU
  body: `blocks` residual blocks (conv-BN-ReLU-conv-BN + skip + ReLU)
  policy head:
    * "conv" (Net6-style, net6.rs:56,98-108): 3x3 conv to move_channels(n)
      planes, flattened channel-major to action_space(n) logits
    * "dense" (legacy Net5-style, net5.rs:56-62): Linear(filters*n^2 ->
      1575) over the legacy move list
  value head: Linear(filters*n^2 -> 1) + tanh (net5.rs:62 / net6.rs:57)

Compute runs in bfloat16 (MXU-native) with float32 params/statistics;
heads produce float32 logits.  Reference sizes: 8 blocks x 128 filters for
5x5, 16 x 128 for 6x6.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from ..sizes import action_space, input_channels, legacy_action_space, move_channels


@dataclass(frozen=True)
class NetConfig:
    n: int
    filters: int = 128
    blocks: int = 8
    policy_head: str = "conv"  # "conv" | "dense"
    dtype: type = jnp.bfloat16
    # inference-only variant: BatchNorm is folded into the conv kernels/
    # biases (Network._fold_bn), so the module skips BN entirely.  Conv
    # parameter names are unchanged, so folded params line up.
    fold_bn: bool = False

    @staticmethod
    def for_size(n: int) -> "NetConfig":
        """Reference defaults: Net5 = 8 blocks, Net6 = 16 blocks."""
        return NetConfig(n=n, blocks=16 if n >= 6 else 8)

    @property
    def policy_size(self) -> int:
        if self.policy_head == "dense":
            return legacy_action_space(self.n)
        return action_space(self.n)


class ResBlock(nn.Module):
    filters: int
    dtype: type
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype)(x)
        if not self.fold_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype)(y)
        if not self.fold_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return nn.relu(y + x)


class TakResNet(nn.Module):
    """Input [B, n, n, input_channels(n)] -> (policy_logits [B, A], value [B])."""

    config: NetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        n = cfg.n
        x = x.astype(cfg.dtype)
        x = nn.Conv(cfg.filters, (3, 3), padding=1, dtype=cfg.dtype)(x)
        if not cfg.fold_bn:
            x = nn.BatchNorm(use_running_average=not train, dtype=cfg.dtype)(x)
        x = nn.relu(x)
        for _ in range(cfg.blocks):
            x = ResBlock(cfg.filters, cfg.dtype, cfg.fold_bn)(x, train)

        if cfg.policy_head == "conv":
            p = nn.Conv(move_channels(n), (3, 3), padding=1, dtype=cfg.dtype)(x)
            # action id = channel * n^2 + row * n + col  -> channel-major flat
            p = jnp.transpose(p, (0, 3, 1, 2)).reshape(p.shape[0], -1)
        else:
            p = nn.Dense(cfg.policy_size, dtype=cfg.dtype)(
                x.reshape(x.shape[0], -1)
            )
        flat = x.reshape(x.shape[0], -1)
        v = nn.Dense(1, dtype=cfg.dtype)(flat)
        return p.astype(jnp.float32), jnp.tanh(v.astype(jnp.float32))[:, 0]


def make_model(cfg: NetConfig) -> TakResNet:
    return TakResNet(cfg)


def dummy_input(cfg: NetConfig, batch: int = 1) -> jnp.ndarray:
    return jnp.zeros((batch, cfg.n, cfg.n, input_channels(cfg.n)), jnp.float32)
