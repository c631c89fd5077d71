from .binning import pretty_cut, qcut, qcut_bin
from .bloom import (bloom_build, bloom_might_contain, bloom_positions,
                    bloom_to_numpy)
from .encoding import bools_to_categorical, linear_combination
from .masks import bool_array_mask, index_mask, slice_mask
from .sketches import merge_sketches, nunique_sketches, sketch_estimate
from .ordered import (global_cumsum, global_ntile, global_rank_cumsum,
                      grouped_cumminmax, grouped_cumsum, grouped_expanding,
                      grouped_ffill,
                      grouped_row_number,
                      grouped_rolling_mean, grouped_rolling_sum, grouped_rolling_var,
                      grouped_shift,
                      grouped_take,
                      global_row_number, global_shift)
from .text import (
    let,
    poly_hash,
    simple_tokens,
    token_count,
    word_ngrams,
)

__all__ = [
    "pretty_cut",
    "qcut",
    "qcut_bin",
    "bools_to_categorical",
    "linear_combination",
    "simple_tokens",
    "token_count",
    "word_ngrams",
    "poly_hash",
    "let",
    "global_row_number",
    "global_cumsum",
    "grouped_cumminmax",
    "grouped_cumsum",
    "grouped_expanding",
    "grouped_ffill",
    "grouped_row_number",
    "grouped_rolling_mean",
    "grouped_rolling_sum",
    "grouped_rolling_var",
    "grouped_shift",
    "grouped_take",
    "global_shift",
    "global_ntile",
    "global_rank_cumsum",
    "slice_mask",
    "index_mask",
    "bool_array_mask",
    "bloom_positions",
    "bloom_build",
    "bloom_to_numpy",
    "bloom_might_contain",
    "nunique_sketches",
    "merge_sketches",
    "sketch_estimate",
]
