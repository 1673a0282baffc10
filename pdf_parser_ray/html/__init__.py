from pdf_parser_ray.html.strip import strip_html  # noqa: F401
