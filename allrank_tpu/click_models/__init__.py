"""Click-model simulator: generate synthetic click-through data on ranked slates.

Host-side numpy implementations of the reference's click-model zoo
(reference: allrank/click_models/base.py, cascade_models.py,
duplicate_aware.py, click_utils.py). Click models are inherently small,
sequential, per-slate decisions — they stay on the host; the expensive part
of the pipeline (scoring + ranking every slate) runs on-device in
``allrank_tpu.inference.rank_slates``.
"""

from allrank_tpu.click_models.base import (  # noqa: F401
    ClickModel,
    ConditionedClickModel,
    FixedClickModel,
    MaxClicksModel,
    MultipleClickModel,
    OnlyRelevantClickModel,
    RandomClickModel,
)
from allrank_tpu.click_models.cascade_models import (  # noqa: F401
    BaseCascadeModel,
    DiverseClicksModel,
)
from allrank_tpu.click_models.duplicate_aware import (  # noqa: F401
    EverythingButDuplicatesClickModel,
)
from allrank_tpu.click_models.click_utils import (  # noqa: F401
    MaskedRemainMasked,
    click_on_slates,
)
