"""Flax model zoo: the TPU-native counterpart of the reference's
models/GANet_deep.py and models/GANet11.py (SURVEY.md §2 #7-#8)."""

from ganet_tpu.models.ganet import GANet
from ganet_tpu.models.feature import FeatureNet
from ganet_tpu.models.guidance import GuidanceNet
from ganet_tpu.models.aggregation import CostAggregation

__all__ = ["GANet", "FeatureNet", "GuidanceNet", "CostAggregation"]
