"""Email / alert sink (SURVEY §2.1 IO23).

Reference semantics (``core/configs/logs.py:110-333``): build an SMTP
transport config from an explicit dict or environment variables
(``build_smtp_transport``, ``logs.py:110-126``), compose a plain-text
``EmailMessage`` (``build_message``, ``logs.py:128-151``), attach a
DataFrame as a CSV file — with an *optional* HTML-table alternative that
is off by default (``attach_dataframe``, ``logs.py:153-219``) — attach
raw bytes with a sniffed mime type (``attach_bytes``, ``logs.py:221-236``),
and send via smtplib with STARTTLS + login (``send_message_via_smtp``,
``logs.py:239-263``), wrapped by ``send_email`` / ``alert_email``
(``logs.py:268-333``) which never raise — they return a status dict.

Spark-first notes: email is a terminal, driver-side sink for *bounded*
alert results — the one place ``toPandas`` is legitimate. The row guard
(``MAX_ALERT_ROWS``) enforces that; a bigger result is a pipeline bug,
not an email. The SMTP connection factory is injectable so the
composition/send logic is unit-testable without a mail server (and so a
deployment can swap in a pooled or OAuth transport).
"""

from __future__ import annotations

import io
import json
import mimetypes
import os
import smtplib
from collections.abc import Callable, Sequence
from email.message import EmailMessage
from typing import Any

from pyspark.sql import DataFrame

MAX_ALERT_ROWS = 100_000


def build_smtp_transport(config: dict[str, Any] | None = None) -> dict[str, Any]:
    """Normalize SMTP parameters from ``config`` or environment variables
    (``logs.py:110-126``). No connection is made here."""
    cfg = config or {}
    return {
        "host": cfg.get("smtp_host") or os.environ.get("SMTP_HOST", "localhost"),
        "port": int(cfg.get("smtp_port") or os.environ.get("SMTP_PORT", 587)),
        "user": cfg.get("smtp_user") or os.environ.get("SMTP_USER"),
        "password": cfg.get("smtp_password") or os.environ.get("SMTP_PASSWORD"),
        "starttls": bool(cfg.get("smtp_starttls", True)),
    }


def build_message(
    subject: str,
    body: str,
    from_addr: str,
    to_addrs: Sequence[str],
    from_name: str | None = None,
) -> EmailMessage:
    """Plain-text message skeleton (``logs.py:128-151``)."""
    msg = EmailMessage()
    msg["From"] = f"{from_name} <{from_addr}>" if from_name else from_addr
    msg["To"] = ", ".join(to_addrs)
    msg["Subject"] = subject
    msg.set_content(body)
    return msg


def attach_dataframe(
    msg: EmailMessage,
    df: DataFrame,
    csv_name: str = "data.csv",
    add_html_alternative: bool = False,
    max_rows: int = MAX_ALERT_ROWS,
) -> int:
    """Attach a bounded Spark DataFrame as a CSV file (``logs.py:153-219``).

    By default no HTML table is injected into the body — matching the
    reference's deliberate choice; ``add_html_alternative=True`` opts in.
    Returns the number of attached rows; raises if the result exceeds
    ``max_rows`` (alerts are aggregates, not exports).
    """
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(f"alert attachment exceeds {max_rows} rows; aggregate first")
    if add_html_alternative:
        table = pdf.to_html(index=False, na_rep="")
        msg.add_alternative(f"<p>Data attached:</p>\n{table}", subtype="html")
    buf = io.StringIO()
    pdf.to_csv(buf, index=False)
    msg.add_attachment(
        buf.getvalue().encode("utf-8"), maintype="text", subtype="csv", filename=csv_name
    )
    return len(pdf)


def attach_records(msg: EmailMessage, records: Any, filename: str = "data.json") -> None:
    """Attach a dict / list payload as JSON (``logs.py:195-203``)."""
    blob = json.dumps(records, default=str, ensure_ascii=False).encode("utf-8")
    msg.add_attachment(blob, maintype="application", subtype="json", filename=filename)


def attach_bytes(msg: EmailMessage, content: bytes, filename: str) -> None:
    """Attach raw bytes with a mime type sniffed from the filename
    (``logs.py:221-236``)."""
    ctype, _ = mimetypes.guess_type(filename)
    maintype, subtype = ctype.split("/", 1) if ctype else ("application", "octet-stream")
    msg.add_attachment(content, maintype=maintype, subtype=subtype, filename=filename)


def send_message_via_smtp(
    msg: EmailMessage,
    transport: dict[str, Any],
    smtp_factory: Callable[[str, int], smtplib.SMTP] | None = None,
) -> None:
    """Send over SMTP with STARTTLS + optional login (``logs.py:239-263``).
    ``smtp_factory`` injects the connection for tests / custom transports."""
    factory = smtp_factory or (lambda h, p: smtplib.SMTP(h, p, timeout=30))
    with factory(transport["host"], int(transport.get("port", 587))) as smtp:
        smtp.ehlo()
        if transport.get("starttls", True) and int(transport.get("port", 587)) == 587:
            smtp.starttls()
            smtp.ehlo()
        if transport.get("user") and transport.get("password"):
            smtp.login(transport["user"], transport["password"])
        smtp.send_message(msg)


def send_email(
    to_emails: Sequence[str],
    subject: str,
    body_text: str,
    data: DataFrame | dict | list | None = None,
    attachments: Sequence[tuple[str, bytes]] | None = None,
    from_name: str | None = None,
    config: dict[str, Any] | None = None,
    smtp_factory: Callable[[str, int], smtplib.SMTP] | None = None,
) -> dict[str, Any]:
    """Compose-and-send, reference contract (``logs.py:268-323``): data
    becomes an attachment (never the body), errors are returned, not
    raised."""
    transport = build_smtp_transport(config)
    from_addr = (
        (config or {}).get("smtp_from")
        or os.environ.get("SMTP_FROM")
        or transport.get("user")
    )
    if not from_addr:
        return {"sent": False, "error": "smtp_from not configured (smtp_from / SMTP_FROM)"}
    try:
        msg = build_message(subject, body_text, from_addr, to_emails, from_name)
        if isinstance(data, DataFrame):
            attach_dataframe(msg, data)
        elif isinstance(data, (dict, list)):
            attach_records(msg, data)
        for fname, content in attachments or ():
            attach_bytes(msg, content, fname)
        send_message_via_smtp(msg, transport, smtp_factory)
        return {"sent": True, "recipients": list(to_emails)}
    except Exception as exc:  # reference contract: report, don't raise
        return {"sent": False, "error": str(exc)}


def alert_email(
    to_emails: Sequence[str],
    subject: str,
    body: str,
    data: DataFrame | dict | list | None = None,
    **kwargs: Any,
) -> dict[str, Any]:
    """Alert wrapper (``logs.py:325-333``) — same path, alert framing."""
    return send_email(to_emails, subject, body, data=data, **kwargs)
