# The reference version of this module is an empty placeholder
# (fine_tuning_classifier.py:5-13); this aliases the working implementation.
from plip_tpu.eval.fine_tuning import FineTuningClassifier as FineTuner  # noqa: F401
