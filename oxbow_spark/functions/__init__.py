from oxbow_spark.functions.genomics import (  # noqa: F401
    alignment_end,
    cigar_ops,
    cigar_qlen,
    cigar_reflen,
    filter_region,
    flag_is,
    item_rgb,
    parse_gt,
    phred_to_scores,
    scores_to_phred,
    strand_from_flag,
    FLAGS,
)
