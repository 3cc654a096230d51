"""oxbow_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of abdenlab/oxbow (reference: /root/reference).

Not a port: the reference is a Rust/Arrow genomic I/O engine whose relational
work is delegated to downstream engines (reference
`docs/getting-started/why.md:15-19`). Here both layers are Spark-first:

- ``oxbow_spark.sources``   — Python DataSource readers for genomic formats
  (SAM/BAM, VCF, BED, GTF/GFF, FASTA/FASTQ, bedGraph ...), emitting Arrow
  batches with header-derived schemas, column pruning and genomic-range
  predicate pushdown.
- ``oxbow_spark.coords``    — coordinate systems + region grammar
  (reference `oxbow/src/coords.rs`).
- ``oxbow_spark.operators`` — the relational layer the reference delegates:
  interval-overlap join, zoom/binned aggregation, dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), similarity search, text analysis — all expressed
  as Catalyst-optimizable DataFrame ops designed for 100 TB scale.
- ``oxbow_spark.functions`` — scalar genomic expressions (CIGAR, flags,
  Phred, genotype parsing) built from pyspark.sql.functions, JVM-side.
"""

__version__ = "0.1.0"
