from unidom_tpu.models.mlp import PolicyMLP, make_policy_model  # noqa: F401
from unidom_tpu.models.distribution import NormalTanhDistribution  # noqa: F401
from unidom_tpu.models.normalizer import (  # noqa: F401
    create_observation_normalizer,
    normalize,
    update_normalizer,
)
