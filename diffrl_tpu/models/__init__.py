from .mlp import (
    ActorDeterministicMLP,
    ActorStochasticMLP,
    CriticMLP,
    DoubleCriticMLP,
    apply_mlp,
    init_mlp,
)
