"""Random-Ball-Cover correspondence engine (reference RBC dependency)."""

from icp_tpu.rbc.construct import RBCIndex, rbc_construct
from icp_tpu.rbc.grouping import (
    GroupLayout,
    GroupedRows,
    gather_grouped,
    group_by_bin,
    group_rows_by_bin,
)
from icp_tpu.rbc.search import (
    GroupedSearchResult,
    SearchResult,
    rbc_point_moments,
    rbc_search,
    rbc_search_grouped,
)
