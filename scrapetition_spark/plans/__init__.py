"""Crawl planning: due-set/politeness planner, bloom seen-filter, robots."""
