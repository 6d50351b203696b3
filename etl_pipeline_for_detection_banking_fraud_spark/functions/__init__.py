from .scalars import (  # noqa: F401
    decimal_comma_amount,
    epoch_diff,
    excel_serial_to_date,
    fio,
    scd2_open_end,
    ts_between_dates,
)
