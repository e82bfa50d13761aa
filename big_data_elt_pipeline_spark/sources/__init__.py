"""Source readers and domain adapters over the driver test corpus."""
