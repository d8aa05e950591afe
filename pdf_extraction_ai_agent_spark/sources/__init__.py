from .excel import excel_sheet_rows, read_xlsx_bytes, write_minimal_xlsx

__all__ = ["excel_sheet_rows", "read_xlsx_bytes", "write_minimal_xlsx"]
