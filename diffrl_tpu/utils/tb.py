"""TensorBoard scalar logging (reference tag-name parity).

The reference logs through tensorboardX with tags like ``rewards/step``,
``rewards/time``, ``rewards/iter`` (/root/reference/algorithms/shac.py:
490-528) so that its multi-seed averaging tool (examples/
combine_batch_logs.py) can find them. This wrapper keeps those exact tag
conventions and degrades to a no-op when tensorboardX is unavailable.
"""

from __future__ import annotations

from typing import Optional


class TBWriter:
    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:
            self._w = None

    def add_scalar(self, tag: str, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, value, step)

    def log(self, name: str, value, iter_count: int, step_count: int,
            time_elapse: Optional[float] = None):
        """Log one metric under the reference's /iter /step /time triplet."""
        self.add_scalar(f"{name}/iter", value, iter_count)
        self.add_scalar(f"{name}/step", value, step_count)
        if time_elapse is not None:
            self.add_scalar(f"{name}/time", value, time_elapse)

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()
