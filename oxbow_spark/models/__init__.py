from oxbow_spark.models.bed_schema import BedSchema
from oxbow_spark.models.gxf import AttributeDef, parse_attributes
from oxbow_spark.models.sam_header import SamHeader
from oxbow_spark.models.vcf_header import VcfHeader

__all__ = ["BedSchema", "SamHeader", "VcfHeader", "AttributeDef", "parse_attributes"]
