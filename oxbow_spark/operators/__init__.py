from oxbow_spark.operators.asof import asof_join
from oxbow_spark.operators.bpe import bpe_segment, bpe_train, word_freqs
from oxbow_spark.operators.classifier import (
    classifier_filter,
    score_quality,
    train_quality_classifier,
    weak_labels_from_heuristics,
)
from oxbow_spark.operators.popgen import (
    allele_stats,
    genotype_alleles,
    sample_qc,
    titv,
)
from oxbow_spark.operators.pileup import (
    consensus,
    naive_snv,
    pileup,
    ref_bases_frame,
)
from oxbow_spark.operators.coverage import (depth_profile,
                                             genomecov_hist,
                                             genomecov_segments)
from oxbow_spark.operators.decontam import ngram_decontaminate
from oxbow_spark.operators.flagstat import flagstat, sn_stats, template_stats
from oxbow_spark.operators.vcf_stats import variant_stats
from oxbow_spark.operators.interval_join import overlap_join
from oxbow_spark.operators.interval_ops import (
    annotate_intervals,
    closest_intervals,
    cluster_intervals,
    complement_intervals,
    coverage_intervals,
    flank_intervals,
    intersect_intervals,
    jaccard_intervals,
    make_windows,
    map_intervals,
    merge_intervals,
    multiinter_intervals,
    reldist_intervals,
    shift_intervals,
    shuffle_intervals,
    slop_intervals,
    spacing_intervals,
    subtract_intervals,
    window_intervals,
)
from oxbow_spark.operators.pipeline import (dsir_log_weights,
                                            dsir_resample,
                                            epoch_shuffle,
                                            temperature_mixture,
                                            temperature_rates)
from oxbow_spark.operators.similarity import (ivf_fit, ivf_topk,
                                              pq_encode, pq_fit,
                                              pq_topk,
                                              prototype_prune_drops,
                                              semantic_dedup,
                                              semantic_dup_drops)
from oxbow_spark.operators.text import remove_dup_spans
from oxbow_spark.operators.liftover import (
    chain_frame,
    liftover_intervals,
    liftover_positions,
    parse_chain,
)
from oxbow_spark.operators.nuc import (gc_windows, getfasta_intervals,
                                       maskfasta_intervals, nuc_stats,
                                       translate_dna)
from oxbow_spark.operators.variant_norm import normalize_variants
from oxbow_spark.operators.zoom import zoom_aggregate

__all__ = [
    "asof_join",
    "coverage_intervals",
    "map_intervals",
    "slop_intervals",
    "shift_intervals",
    "shuffle_intervals",
    "flank_intervals",
    "genomecov_hist",
    "genomecov_segments",
    "ivf_fit",
    "ivf_topk",
    "pq_encode",
    "pq_fit",
    "pq_topk",
    "prototype_prune_drops",
    "semantic_dedup",
    "semantic_dup_drops",
    "remove_dup_spans",
    "dsir_log_weights",
    "dsir_resample",
    "bpe_segment",
    "pileup",
    "bpe_train",
    "word_freqs",
    "chain_frame",
    "closest_intervals",
    "complement_intervals",
    "depth_profile",
    "flagstat",
    "sn_stats",
    "template_stats",
    "variant_stats",
    "gc_windows",
    "getfasta_intervals",
    "maskfasta_intervals",
    "annotate_intervals",
    "cluster_intervals",
    "intersect_intervals",
    "liftover_intervals",
    "liftover_positions",
    "jaccard_intervals",
    "epoch_shuffle",
    "make_windows",
    "temperature_mixture",
    "translate_dna",
    "temperature_rates",
    "merge_intervals",
    "multiinter_intervals",
    "ngram_decontaminate",
    "reldist_intervals",
    "spacing_intervals",
    "normalize_variants",
    "nuc_stats",
    "overlap_join",
    "parse_chain",
    "subtract_intervals",
    "window_intervals",
    "zoom_aggregate",
]
