"""CLI arg helpers (reference: allrank/utils/args_utils.py:1-2)."""

from typing import List


def split_as_strings(arg: str) -> List[str]:
    return arg.split(",")
