"""wandb metric forwarding.

Replaces the reference's embedded-Python MetricSender
(src/public/RLGymPPO_CPP/Util/MetricSender.{h,cpp} +
python_scripts/metric_receiver.py): we are already Python, so the
interpreter embedding disappears; the behavior is identical — wandb.init
with optional run-id resume, one log call per iteration. wandb is optional;
without it the sender degrades to a no-op with a single warning.
"""


class MetricSender:
    def __init__(self, project="rlgymppo-cpp-tpu", group="unnamed-runs",
                 name="rlgymppo-cpp-tpu-run", run_id=None):
        self.run = None
        self.run_id = run_id
        try:
            import wandb
        except ImportError:
            print("MetricSender: wandb not installed, metrics will only "
                  "print to console")
            return
        if run_id:
            self.run = wandb.init(project=project, group=group, name=name,
                                  id=run_id, resume="allow")
        else:
            self.run = wandb.init(project=project, group=group, name=name)
        self.run_id = self.run.id

    def send(self, report):
        """Report (or plain dict) -> wandb.log (metric_receiver.py:38-39)."""
        if self.run is None:
            return
        metrics = dict(report.items() if hasattr(report, "items") else report)
        self.run.log({k: float(v) for k, v in metrics.items()})
