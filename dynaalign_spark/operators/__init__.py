from .signatures import add_signatures, minhash_signature_udf, agreement_sim_col
from .lsh import band_keys, candidate_pairs
from .threshold import quantile_threshold, threshold_edges
from .components import connected_components
from .clusterbreak import clusterbreak_spark
