"""Omniverse Kit extension for diffrl_tpu.

Capability parity with the reference's dFlex Kit extension
(/root/reference/dflex/extension/dflex.py): an editor panel that loads an
experiment script, drives training or inference incrementally from the
viewport update loop, streams the loss curve / log into the UI, and keeps
the USD stage timeline in sync with simulated time.

Architecture differs deliberately (SURVEY.md §7 translation): the
reference exec()s the experiment script into module globals and reaches
into a mutable global ``experiment``; here the runtime-independent driver
(:mod:`.experiment`) is a small protocol object produced by the script's
``make_experiment()`` factory, so the whole driver is importable and
testable headlessly (tests/test_extension.py) — only :mod:`.kit_ext`
touches ``omni.*``, and only inside ``on_startup``.
"""

from .experiment import (  # noqa: F401
    Experiment,
    PolicyExperiment,
    load_experiment_script,
)

__all__ = ["Experiment", "PolicyExperiment", "load_experiment_script",
           "is_kit_available"]


def is_kit_available() -> bool:
    """True when running inside an Omniverse Kit process (omni.ui import)."""
    try:  # pragma: no cover - requires an Omniverse runtime
        import omni.ui  # noqa: F401

        return True
    except Exception:
        return False
