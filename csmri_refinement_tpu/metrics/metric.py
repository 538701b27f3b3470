"""Streaming metric accumulators with direction-aware comparison.

Rebuild of /root/reference/metrics/metric.py:4-88: a Metric holds a running
sum/count; MinMetric/MaxMetric define which direction is better and the
worst possible value (used to initialize best-checkpoint tracking).
"""


class Metric:
  def __init__(self, values):
    try:
      iterator = iter(values)
    except TypeError:
      self._value = float(values)
      self.sum_values = float(values)
      self.num_updates = 1
    else:
      self._value = None
      self.sum_values = 0.0
      self.num_updates = 0
      for value in iterator:
        self.sum_values += float(value)
        self.num_updates += 1

  @property
  def value(self):
    if self._value is None:
      return self.average().value
    return self._value

  @property
  def worst_value(self):
    raise NotImplementedError('Subclasses must override worst_value')

  def __str__(self):
    abs_value = abs(self.value)
    if abs_value >= 1e-4:
      return '{:.4f}'.format(self.value)
    elif abs_value >= 1e-8:
      return '{:.8f}'.format(self.value)
    return '{:.12f}'.format(self.value)

  def __gt__(self, other):
    raise NotImplementedError('Subclasses must override __gt__')

  def accumulate(self, metric):
    self._value = metric._value
    self.sum_values += metric.sum_values
    self.num_updates += metric.num_updates

  def average(self):
    return type(self)(self.sum_values / max(self.num_updates, 1))


class MinMetric(Metric):
  """Smaller is better (losses, HFEN)."""

  @property
  def worst_value(self):
    return MinMetric(float('inf'))

  def __gt__(self, other):
    return self.value < other.value


class MaxMetric(Metric):
  """Larger is better (PSNR, SSIM, dice, accuracy)."""

  @property
  def worst_value(self):
    return MaxMetric(float('-inf'))

  def __gt__(self, other):
    return self.value > other.value
