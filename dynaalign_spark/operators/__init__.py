from .clusterbreak import clusterbreak_spark
from .components import connected_components
from .consensus import cluster_representatives
from .lsh import band_keys, candidate_pairs
from .signatures import add_signatures, agreement_sim_col, minhash_signature_udf
from .simhash import (
    add_simhash,
    dedup_pixels,
    psnr_verify_pairs,
    row_invariant_violations,
    simhash_candidates,
)
from .threshold import grouped_quantile_threshold, quantile_threshold, threshold_edges
