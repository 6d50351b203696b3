from .csv_source import read_transactions  # noqa: F401
from .xlsx import read_passport_blacklist, read_terminals, read_xlsx_rows  # noqa: F401
