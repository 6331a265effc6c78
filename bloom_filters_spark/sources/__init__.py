from .fixtures import sales_lines_df, users_df, words_df
from .pages import generate_pages

__all__ = ["generate_pages", "words_df", "users_df", "sales_lines_df"]
