"""Statistics / association layer (PheWAS) — reference ``assoc/``."""

from ukbb_cardiac_tpu.assoc.fdr import fdr_threshold, p_adjust_fdr
from ukbb_cardiac_tpu.assoc.phewas import (
    age_by_date,
    build_confounders,
    clean_columns,
    deconfound_idps,
    load_continuous_map,
    load_field_categories,
    load_field_names,
    manhattan_plot,
    masked_pearson,
    normalise,
    normalise_non_idps,
    rank_normalise,
    significance_thresholds,
    top_hits_table,
    univariate_correlation,
)
