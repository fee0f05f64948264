"""Warmup utility compiles the whole generation shape family (tiny config)."""

from tak_tpu.engine.core import get_engine
from tak_tpu.mcts.search import SearchConfig
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig
from tak_tpu.pit import PitConfig
from tak_tpu.selfplay import SelfPlayConfig
from tak_tpu.utils.warmup import warmup_generation


def test_warmup_generation_tiny():
    engine = get_engine(3)
    network = Network(engine, NetConfig(n=3, filters=8, blocks=1))
    sp = SelfPlayConfig(
        workers=4, komi=2,
        search=SearchConfig(num_sims=8, wave_size=2, max_children=16),
    )
    pit = PitConfig(
        games=4, komi=2,
        search=SearchConfig(num_sims=8, wave_size=2, max_children=16),
    )
    logs = []
    warmup_generation(engine, network, sp, pit, chunk_size=4,
                      log=logs.append)
    joined = "\n".join(logs)
    for name in ("run_sims", "train chunk", "optimizer step", "pit run_sims",
                 "total"):
        assert name in joined
