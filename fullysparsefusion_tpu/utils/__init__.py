from .gather import masked_gather, pad_to
from .containers import PointBatch, GroundTruth
