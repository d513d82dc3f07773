"""Network zoo."""

from mava_tpu.networks.actor_critic import (
    FeedForwardActor,
    FeedForwardQNet,
    FeedForwardValueNet,
    RecQNetwork,
    RecurrentActor,
    RecurrentValueNet,
    ScannedRNN,
)
from mava_tpu.networks.factory import make_torso
from mava_tpu.networks.heads import ContinuousActionHead, DiscreteActionHead
from mava_tpu.networks.torsos import CNNTorso, MLPTorso

__all__ = [
    "CNNTorso",
    "ContinuousActionHead",
    "DiscreteActionHead",
    "FeedForwardActor",
    "FeedForwardQNet",
    "FeedForwardValueNet",
    "MLPTorso",
    "RecQNetwork",
    "RecurrentActor",
    "RecurrentValueNet",
    "ScannedRNN",
    "make_torso",
]
