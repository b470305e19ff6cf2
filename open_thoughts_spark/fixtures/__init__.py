from open_thoughts_spark.fixtures.transcripts import generate_transcripts, write_transcripts

__all__ = ["generate_transcripts", "write_transcripts"]
