from .logging import MetricLogger
