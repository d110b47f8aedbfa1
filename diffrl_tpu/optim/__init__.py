"""Optimizers — parity with the reference's optim package
(/root/reference/optim/gd.py:12-44).

The reference ships a hand-rolled plain gradient-descent torch Optimizer
used by BPTT's ``algo: gd`` mode. In this stack optimizers are optax
transforms; ``gd(lr)`` is provided under the reference's name.
"""

import optax


def gd(learning_rate):
    """Plain gradient descent (the reference's GD optimizer)."""
    return optax.sgd(learning_rate)


adam = optax.adam
sgd = optax.sgd
