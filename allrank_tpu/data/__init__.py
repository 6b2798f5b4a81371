"""Slate data pipeline: libsvm parsing, qid grouping, length fixing, and
fixed-shape batch assembly with async device prefetch."""

from allrank_tpu.data.dataset import (  # noqa: F401
    SlateDataset,
    load_dataset,
    load_dataset_role,
)
from allrank_tpu.data.batching import (  # noqa: F401
    BucketedSlateBatcher,
    DevicePrefetcher,
    SlateBatcher,
)
from allrank_tpu.data.saving import write_to_libsvm_without_masked  # noqa: F401
from allrank_tpu.data.dummy import generate_dummy_data, write_dummy_dataset  # noqa: F401
