"""Application assembly: context + router + HTTP server.

Counterpart of the reference's FastAPI assembly (super_rag/app.py):
registers the REST routes, health endpoint, and (once present) the MCP
mount; starts the periodic reconciler.  Run with:

    python -m super_rag_tpu.app
"""

from __future__ import annotations

import asyncio
import logging
from typing import Optional

from super_rag_tpu.api.http import HttpServer
from super_rag_tpu.api.routes import build_router
from super_rag_tpu.config import Settings, settings as default_settings
from super_rag_tpu.service.context import AppContext, build_context

logger = logging.getLogger(__name__)


def _apply_platform_override() -> None:
    """Honor SUPER_RAG_FORCE_CPU=1 even on images whose TPU plugin
    force-registers itself via sitecustomize and overrides JAX_PLATFORMS
    — the update must happen after `import jax`, before any dispatch."""
    import os

    if os.environ.get("SUPER_RAG_FORCE_CPU", "").lower() in ("1", "true"):
        import jax

        jax.config.update("jax_platforms", "cpu")


class App:
    def __init__(self, cfg: Optional[Settings] = None,
                 background_tasks: bool = True,
                 ctx: Optional[AppContext] = None):
        from super_rag_tpu.utils.jaxcache import enable_compilation_cache

        _apply_platform_override()
        enable_compilation_cache()  # remote TPU compiles are minutes; cache them
        self.cfg = cfg or default_settings
        self.ctx = ctx or build_context(self.cfg, background_tasks=background_tasks)
        self.router = build_router(self.ctx)
        try:
            from super_rag_tpu.mcp.server import register_mcp_routes

            register_mcp_routes(self.router, self.ctx)
        except ImportError:
            pass
        from super_rag_tpu.api.webui import register_webui_routes

        register_webui_routes(self.router)
        self.server = HttpServer(self.router)

    async def start(self, host: Optional[str] = None,
                    port: Optional[int] = None) -> None:
        await self.server.start(host or self.cfg.host,
                                port if port is not None else self.cfg.port)
        self.ctx.reconciler.start_periodic(self.cfg.reconcile_interval_s)
        # startup recovery: ACTIVE indexes whose device rows were lost
        # (deleted snapshots, crash before flush) are requeued and rebuilt
        await asyncio.to_thread(
            self.ctx.reconciler.verify_engine_state, self.ctx.engines
        )
        self._snapshot_task = asyncio.create_task(self._periodic_snapshots())
        logger.info("super_rag_tpu listening on %s:%s",
                    self.cfg.host, self.server.port)

    async def _periodic_snapshots(self, interval_s: float = 900.0) -> None:
        """Flush device indexes to disk so a crash never rebuilds HBM
        state from scratch (snapshots also happen on clean stop)."""
        while True:
            await asyncio.sleep(interval_s)
            try:
                await asyncio.to_thread(self.ctx.engines.snapshot_all)
            except Exception:  # noqa: BLE001
                logger.exception("periodic snapshot failed")

    async def stop(self) -> None:
        if getattr(self, "_snapshot_task", None) is not None:
            self._snapshot_task.cancel()
        self.ctx.reconciler.stop()
        self.ctx.scheduler.wait_idle(timeout=30)
        self.ctx.scheduler.shutdown()
        self.ctx.engines.snapshot_all()
        await self.server.stop()

    @property
    def port(self) -> int:
        return self.server.port


async def main() -> None:
    logging.basicConfig(level=logging.INFO)
    app = App()
    await app.start()
    try:
        await self_serve(app)
    finally:
        await app.stop()


async def self_serve(app: App) -> None:
    await app.server.serve_forever()


if __name__ == "__main__":
    asyncio.run(main())
