"""Click-model tests — seeded-RNG goldens carried over from the reference
suite (reference: tests/click_models/*.py); they match exactly because both
implementations draw from numpy's global RNG in the same order."""

import numpy as np
import pytest

from allrank_tpu.click_models import (
    BaseCascadeModel,
    ConditionedClickModel,
    DiverseClicksModel,
    EverythingButDuplicatesClickModel,
    FixedClickModel,
    MaskedRemainMasked,
    MaxClicksModel,
    MultipleClickModel,
    OnlyRelevantClickModel,
    RandomClickModel,
    click_on_slates,
)
from allrank_tpu.constants import PADDED_Y_VALUE
from tests.click_models import click


def test_random_click_model_single():
    click_model = RandomClickModel(1)
    np.random.seed(42)
    assert click(click_model, [], [1]) == [1]
    assert click(click_model, [], [1, 2]) == [0, 1]
    assert click(click_model, [], [1, 2, 3]) == [0, 1, 0]


def test_random_click_model_multiple():
    np.random.seed(42)
    assert click(RandomClickModel(2), [], [1, 2, 3, 4]) == [0, 1, 0, 1]
    assert click(RandomClickModel(3), [], [1, 2, 3, 4]) == [1, 1, 0, 1]
    assert click(RandomClickModel(4), [], [1, 2, 3, 4]) == [1, 1, 1, 1]


def test_fixed_click_model():
    assert click(FixedClickModel([0]), [], [1, 2, 3]) == [1, 0, 0]
    assert click(FixedClickModel([0, 1]), [], [1, 2, 3, 4]) == [1, 1, 0, 0]
    assert click(FixedClickModel([0, 2, 3]), [], [1, 2, 3, 4]) == [1, 0, 1, 1]


def test_multiple_click_model_statistical():
    np.random.seed(42)
    model = MultipleClickModel(
        [FixedClickModel([0]), FixedClickModel([1])], probabilities=[0.5, 0.5]
    )
    clicks = np.array([click(model, [], [1, 2]) for _ in range(20000)])
    assert 9950 < np.sum(clicks[:, 0]) < 10050
    assert 9950 < np.sum(clicks[:, 1]) < 10050


def test_multiple_click_model_probabilities_must_sum_to_one():
    with pytest.raises(AssertionError):
        MultipleClickModel([FixedClickModel([0])], probabilities=[0.5])


def test_conditioned_click_model_and_or():
    m0, m1 = FixedClickModel([0, 1]), FixedClickModel([1, 2])
    assert click(ConditionedClickModel([m0, m1], np.all), [], [1, 2, 3]) == [0, 1, 0]
    assert click(ConditionedClickModel([m0, m1], np.any), [], [1, 2, 3, 4]) == [1, 1, 1, 0]
    # string combiner for JSON configs
    assert click(ConditionedClickModel([m0, m1], "all"), [], [1, 2, 3]) == [0, 1, 0]


def test_max_clicks_model():
    inner = FixedClickModel([0, 1, 2, 3])
    assert click(MaxClicksModel(inner, 2), [], [1, 2, 3, 4]) == [1, 1, 0, 0]
    assert click(MaxClicksModel(inner, None), [], [1, 2, 3, 4]) == [1, 1, 1, 1]


def test_only_relevant_click_model():
    assert click(OnlyRelevantClickModel(1), [[0, 1]], [1]) == [1]
    assert click(OnlyRelevantClickModel(1), [[0, 1]], [0]) == [0]
    assert click(OnlyRelevantClickModel(2), [[1, 1], [1, 0], [0, 0]], [0, 1, 2]) == [0, 0, 1]


def test_base_cascade_model_no_eta():
    y = [1, 2, 0, 4, 3]
    assert click(BaseCascadeModel(0.0, 1), [], y) == [1, 1, 0, 1, 1]
    assert click(BaseCascadeModel(0.0, 2), [], y) == [0, 1, 0, 1, 1]
    assert click(BaseCascadeModel(0.0, 4), [], y) == [0, 0, 0, 1, 0]


def test_base_cascade_model_eta():
    np.random.seed(42)
    click_model_1 = BaseCascadeModel(0.3, 1)
    click_model_2 = BaseCascadeModel(0.5, 1)
    assert click(click_model_1, [], [1, 2]) == [1, 0]
    assert click(click_model_1, [], [1, 2, 3]) == [1, 1, 1]
    assert click(click_model_1, [], [1, 2, 3, 4]) == [1, 1, 0, 1]
    assert click(click_model_2, [], [1, 2]) == [1, 1]
    assert click(click_model_2, [], [1, 2, 3]) == [1, 0, 1]
    assert click(click_model_2, [], [1, 2, 3, 4]) == [1, 1, 1, 0]


def test_duplicate_aware_click_model():
    cm = EverythingButDuplicatesClickModel()
    assert click(cm, np.array([[0, 1]]), []) == [1]
    assert click(cm, np.array([[1, 1], [1, 0]]), []) == [1, 1]
    assert click(cm, np.array([[1, 1], [1, 1]]), []) == [1, 0]
    assert click(cm, np.array([[1, 1], [1, 1], [0, 0]]), []) == [1, 0, 1]
    cm_margin = EverythingButDuplicatesClickModel(0.1)
    assert click(cm_margin, np.array([[1, 1], [1, 0.99], [1, 0.8]]), []) == [1, 0, 1]


def test_diverse_clicks_model():
    click_model = DiverseClicksModel(BaseCascadeModel(0.0, 1))
    assert click(click_model, np.array([[0, 1]]), [1]) == [1]
    assert click(click_model, np.array([[0, 1], [0, 1]]), [1, 1]) == [1, 0]
    assert click(click_model, np.array([[0, 1], [0, 1], [1, 1]]), [1, 1, 1]) == [1, 0, 0]
    assert click(
        click_model, np.array([[0, 1], [0, 1], [2, 2], [1, 1]]), [1, 1, 1, 1]
    ) == [1, 0, 1, 0]


def test_masked_should_remain_masked():
    click_model = MaskedRemainMasked(FixedClickModel(click_positions=[1]))
    assert click(
        click_model, np.ones((3, 1)), np.array([0, 0, PADDED_Y_VALUE])
    ) == [0, 1, PADDED_Y_VALUE]


def test_inner_click_model_should_just_get_unmasked_docs():
    np.random.seed(42)
    click_model = MaskedRemainMasked(RandomClickModel(n_clicks=1))
    y = np.array([0] + [PADDED_Y_VALUE] * 4)
    assert click(click_model, np.ones((5, 1)), y) == [1] + [PADDED_Y_VALUE] * 4


def test_click_on_slates():
    np.random.seed(42)
    X = np.random.rand(5, 5, 10).astype(np.float32)
    y = np.vstack([np.random.randint(0, 4, size=len(x)) for x in X])
    slates_X, slates_y = click_on_slates((X, y), RandomClickModel(2), True)
    assert len(slates_X) == X.shape[0]
    assert (np.stack(slates_X) == X).all()
    assert (np.sum(np.stack(slates_y), axis=1) == 2).all()


def test_click_on_slates_without_empty():
    np.random.seed(42)
    X = np.array([[[-1.0]], [[1.0]]])
    y = np.vstack([np.array([0]), np.array([1])])
    slates_X, slates_y = click_on_slates((X, y), OnlyRelevantClickModel(1), False)
    assert len(slates_X) == 1
    assert (slates_X[0] == X[1]).all()
    assert slates_y[0].tolist() == [1]


def test_click_on_slates_all_empty_returns_empty():
    """Deviation from the reference, which crashes on zip(*[]) here."""
    X = np.ones((2, 3, 2))
    y = np.zeros((2, 3))
    slates_X, slates_y = click_on_slates((X, y), OnlyRelevantClickModel(5), False)
    assert slates_X == [] and slates_y == []
