"""Data layer (L4): file ingestion -> reduction/filtering -> Markov pairing
-> normalization -> batched loaders with resolution bucketing.

The reference implements this as 24 torch Dataset modules
(dataloaders/*.py); here it is a small set of composable numpy transforms
plus reference-named factory functions returning the same tuples the
drivers consume positionally:
    (train, val, test, rollout, x_normalizer, y_normalizer)        # 'simple'
    (train, val, test, rollout, min_data, max_data, min_model, max_model)
                                                                   # 'minmax'

Everything is host-side numpy; the Trainer device-puts batches with the
mesh sharding. Batches within one bucket have a single static shape, which
is exactly what XLA wants.
"""

from resolution_pde_tpu.data.dataset import (
    ArrayDataset,
    MultiResDataset,
    fit_normalizers,
)
from resolution_pde_tpu.data.loader import Loader, ResolutionBucketedLoader
from resolution_pde_tpu.data.factories import (
    ks_markov_dataset,
    burger_markov_dataset,
    ns_markov_dataset,
    ks_true_multires_markov_dataset,
    burger_true_multires_markov_dataset,
    ns_true_multires_markov_dataset,
    darcy_dataset,
    active_matter_markov_dataset,
    burger_window_dataset,
    ns_window_dataset,
)

__all__ = [
    "ArrayDataset",
    "MultiResDataset",
    "fit_normalizers",
    "Loader",
    "ResolutionBucketedLoader",
    "ks_markov_dataset",
    "burger_markov_dataset",
    "ns_markov_dataset",
    "ks_true_multires_markov_dataset",
    "burger_true_multires_markov_dataset",
    "ns_true_multires_markov_dataset",
    "darcy_dataset",
    "active_matter_markov_dataset",
    "burger_window_dataset",
    "ns_window_dataset",
]
