"""Wall-clock timer (Util/Timer.h:5-22)."""

import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()

    def elapsed(self):
        return time.perf_counter() - self._start
