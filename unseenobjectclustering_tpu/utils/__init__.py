"""Host-side utilities: metrics, masks, checkpoint IO, visualization."""

from unseenobjectclustering_tpu.utils.evaluation import (multilabel_metrics,
                                                         seg2bmap,
                                                         boundary_overlap)

__all__ = ["multilabel_metrics", "seg2bmap", "boundary_overlap"]
