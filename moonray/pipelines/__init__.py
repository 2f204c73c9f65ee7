"""End-to-end pipelines wired for the driver contract (__ray_entry__)
and the bench harness."""
