"""BN-folded inference == regular BatchNorm inference."""

import jax
import jax.numpy as jnp
import numpy as np

from tak_tpu.engine.core import get_engine
from tak_tpu.model.network import Network
from tak_tpu.model.resnet import NetConfig


def test_folded_inference_matches_batchnorm():
    engine = get_engine(5)
    net = Network(engine, NetConfig(n=5, filters=32, blocks=2))
    variables = net.init_variables(0)

    # make the fold non-trivial: perturb the BN statistics and params
    rng = np.random.default_rng(0)

    def perturb(tree, scale):
        return jax.tree.map(
            lambda x: x + jnp.asarray(
                rng.normal(0, scale, x.shape).astype(np.float32)
            ),
            tree,
        )

    variables = {
        "params": perturb(variables["params"], 0.05),
        "batch_stats": jax.tree.map(
            lambda x: jnp.abs(
                x + jnp.asarray(rng.normal(0.2, 0.1, x.shape).astype(np.float32))
            ),
            variables["batch_stats"],
        ),
    }

    planes = jnp.asarray(
        rng.normal(0, 1, (16, 5, 5, net.config.policy_size and 72)).astype(
            np.float32
        )
    )
    # reference: the unfolded model with running-average BN
    logits_ref, value_ref = net.model.apply(variables, planes, train=False)
    probs_ref = jax.nn.softmax(logits_ref, axis=-1)

    probs, value = net.policy_eval(variables, planes)  # folded path

    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(probs_ref), atol=2e-3
    )
    # bf16 reassociation wobble is amplified by tanh; this is a numeric
    # equivalence check, not a bitwise one
    np.testing.assert_allclose(
        np.asarray(value), np.asarray(value_ref), atol=6e-2
    )
