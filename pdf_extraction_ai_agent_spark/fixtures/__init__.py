from .transcripts import generate_transcripts, transcripts_spark_df, TRANSCRIPT_SCHEMA

__all__ = ["generate_transcripts", "transcripts_spark_df", "TRANSCRIPT_SCHEMA"]
