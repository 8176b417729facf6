"""Engine: two-stage inference pipeline, training step, evaluation loops."""

from unseenobjectclustering_tpu.engine.builder import (build_segmentor,
                                                       init_variables,
                                                       load_network_variables)
from unseenobjectclustering_tpu.engine.evaluate import (
    evaluate_dataset, evaluate_dataset_sharded)
from unseenobjectclustering_tpu.engine.pipeline import (SegmentationResult,
                                                        Segmentor)
from unseenobjectclustering_tpu.engine.train import (
    TrainState, create_train_state, make_optimizer, make_train_step,
    make_train_step_resident, train_epochs, train_epochs_resident, train_step)

__all__ = [
    "Segmentor", "SegmentationResult", "build_segmentor", "init_variables",
    "load_network_variables", "evaluate_dataset", "evaluate_dataset_sharded",
    "TrainState", "create_train_state", "make_optimizer", "make_train_step",
    "make_train_step_resident", "train_epochs", "train_epochs_resident",
    "train_step",
]
