"""Remote-linking client — parity shim for the reference's RemoteAnnLinker
(remote_ann_linker.py:95-143): POST batches of documents to a /link endpoint
and re-zip the returned span ids onto the caller's documents.

The engine's production answer to "KB cannot be in memory"
(remote_ann_linker.py:21-23) is the distributed join, not a network hop —
but the reference ALSO ships this client surface, so the shim preserves its
observable contract for drop-in use against `link/serve.py` (or the
reference's own FastAPI app):

  * documents travel as {"documents": [{"spans": [...], "context": ...}]}
    in minibatches (default size 32, remote_ann_linker.py:95,106)
  * an HTTP error status raises ValueError("Error in making request to the
    server.", <original error>) — the reference wraps requests.HTTPError in
    exactly that ValueError (remote_ann_linker.py:137-139)
  * response docs zip positionally back onto the batch; a span's `id` is
    applied only when truthy (remote_ann_linker.py:113-117 sets kb_id only
    `if span["id"]`)

stdlib-only (urllib; requests is not in this container).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any, Iterable, Iterator


class RemoteLinkerClient:
    """Client for a /link endpoint (serve.py's or the reference server's)."""

    def __init__(self, base_url: str, headers: dict[str, str] | None = None):
        self.base_url = base_url
        self.headers = {"Content-Type": "application/json", **(headers or {})}

    def _make_request(self, documents: list[dict[str, Any]]) -> dict[str, Any]:
        """One POST of a document batch. Raises the reference's ValueError
        contract on any HTTP error envelope."""
        req = urllib.request.Request(
            self.base_url,
            data=json.dumps({"documents": documents}).encode(),
            headers=self.headers,
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            # reference: raise ValueError("Error in making request to the
            # server.", e) — typed error the caller can catch uniformly
            raise ValueError("Error in making request to the server.", e) from e

    def link_batch(self, documents: list[dict[str, Any]]) -> list[dict[str, Any]]:
        """Link one batch; returns the server's response documents."""
        return self._make_request(documents)["documents"]

    def pipe(
        self, docs: Iterable[dict[str, Any]], batch_size: int = 32
    ) -> Iterator[dict[str, Any]]:
        """Stream documents through the endpoint in minibatches, applying
        returned span ids IN PLACE onto the caller's span dicts (the
        reference mutates doc.ents the same way) and yielding each doc."""
        batch: list[dict[str, Any]] = []

        def flush() -> Iterator[dict[str, Any]]:
            if not batch:
                return
            res_docs = self.link_batch(
                [{"spans": d.get("spans") or [], "context": d.get("context")} for d in batch]
            )
            for doc, res in zip(batch, res_docs):
                for span, res_span in zip(doc.get("spans") or [], res["spans"]):
                    if res_span.get("id"):
                        span["id"] = res_span["id"]
                yield doc
            batch.clear()

        for doc in docs:
            batch.append(doc)
            if len(batch) >= batch_size:
                yield from flush()
        yield from flush()
