"""Ordered string->number metric map (Report.h:23-93)."""


class Report:
    def __init__(self):
        self.data = {}

    def __setitem__(self, key, value):
        self.data[key] = float(value)

    def __getitem__(self, key):
        return self.data[key]

    def __contains__(self, key):
        return key in self.data

    def __iter__(self):
        return iter(self.data)

    def keys(self):
        return self.data.keys()

    def get(self, key, default=None):
        return self.data.get(key, default)

    def items(self):
        return self.to_dict().items()

    def accum(self, key, value):
        self.data[key] = self.data.get(key, 0.0) + float(value)

    def accum_avg(self, key, value):
        """Average-tracking pair like Report::AccumAvg/GetAvg."""
        self.accum(key, value)
        self.accum("__count_" + key, 1)

    def get_avg(self, key):
        count = self.data.get("__count_" + key, 0)
        return self.data.get(key, 0.0) / max(count, 1)

    def update(self, other):
        for k, v in (other.data if isinstance(other, Report) else other).items():
            self.data[k] = float(v)

    def to_dict(self):
        return {k: v for k, v in self.data.items()
                if not k.startswith("__count_")}

    @staticmethod
    def _fmt(value):
        if value == int(value) and abs(value) < 1e15:
            return f"{int(value):,}"
        return f"{value:.6g}"

    def display(self, order=None, indent="  "):
        """Human console report (Learner::DisplayReport, Learner.cpp:379-434).

        `order` is a list of names; names starting with '-' are indented
        continuation lines, None entries are blank separators.
        """
        lines = []
        names = order if order is not None else list(self.to_dict().keys())
        for name in names:
            if name is None:
                lines.append("")
                continue
            depth = 0
            real = name
            while real.startswith("-"):
                depth += 1
                real = real[1:]
            if real in self.data:
                lines.append(f"{indent * depth}{real}: "
                             f"{self._fmt(self.data[real])}")
        return "\n".join(lines)
