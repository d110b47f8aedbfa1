from .builders import A2CNetwork
from .mlp import (
    ActorCriticPPO,
    ActorDeterministicMLP,
    ActorStochasticMLP,
    CriticMLP,
    DoubleCriticMLP,
    SACActor,
    apply_mlp,
    init_mlp,
)
