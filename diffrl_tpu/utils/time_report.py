"""Named wall-clock timers (reference: /root/reference/utils/time_report.py)."""

from __future__ import annotations

import time


class Timer:
    def __init__(self, name):
        self.name = name
        self.start_time = None
        self.time_total = 0.0

    def on(self):
        assert self.start_time is None, f"timer {self.name} already on"
        self.start_time = time.time()

    def off(self):
        assert self.start_time is not None, f"timer {self.name} not on"
        self.time_total += time.time() - self.start_time
        self.start_time = None

    def report(self):
        print(f"time report [{self.name}]: {self.time_total:.2f} seconds")

    def clear(self):
        self.start_time = None
        self.time_total = 0.0


class TimeReport:
    def __init__(self):
        self.timers = {}

    def add_timer(self, name):
        assert name not in self.timers
        self.timers[name] = Timer(name)

    def start_timer(self, name):
        self.timers[name].on()

    def end_timer(self, name):
        self.timers[name].off()

    def add_time(self, name, seconds):
        """Accumulate an externally-measured duration (used by pipelined
        epoch loops where start/stop pairs around the async dispatch would
        only time the dispatch, not the epoch)."""
        self.timers[name].time_total += seconds

    def report(self, name=None):
        if name is not None:
            self.timers[name].report()
        else:
            print("------------Time Report------------")
            for t in self.timers.values():
                t.report()
            print("-----------------------------------")

    def clear_timer(self, name=None):
        if name is not None:
            self.timers[name].clear()
        else:
            for t in self.timers.values():
                t.clear()

    def pop_timer(self, name=None):
        if name is not None:
            self.timers[name].report()
            del self.timers[name]
        else:
            self.report()
            self.timers = {}
