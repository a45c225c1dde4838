from .udfs import decode_html_udf, rtf_to_text_udf

__all__ = ["decode_html_udf", "rtf_to_text_udf"]
