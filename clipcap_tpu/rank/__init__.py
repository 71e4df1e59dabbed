from .rankers import CLIPRanker, BLIPRanker, cos_sim
from .cascade import two_stage_rank, threshold_cascade
