from open_thoughts_spark.functions.langid import with_langid, langid_pandas
from open_thoughts_spark.functions.perplexity import with_perplexity, bits_per_char_batch

__all__ = ["with_langid", "langid_pandas", "with_perplexity", "bits_per_char_batch"]
