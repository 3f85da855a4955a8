/**
 * ComfyUI web extension: iframe preview widgets for the Comfy3D
 * preview nodes. Counterpart of the reference's web/visualization.js
 * (registerExtension + beforeRegisterNodeDef iframe injection,
 * reference web/visualization.js:119-163) written fresh for this
 * framework's viewer.html (which renders meshes via three.js and 3DGS
 * plys as sorted gaussian splats).
 *
 * Loaded by ComfyUI through the package's WEB_DIRECTORY handoff.
 */
import { app } from "../../scripts/app.js";

const PREVIEW_NODES = ["[Comfy3D] Preview 3DGS", "[Comfy3D] Preview 3DMesh"];
const VIEWER = new URL("viewer.html", import.meta.url).href;

class Visualizer {
  constructor(node, container) {
    this.node = node;
    this.iframe = document.createElement("iframe");
    Object.assign(this.iframe.style, {
      width: "100%", height: "100%", border: "none",
      background: "#202020",
    });
    this.iframe.src = VIEWER;
    container.appendChild(this.iframe);
  }

  update(filepath, timestamp) {
    const url = `${VIEWER}?filepath=${encodeURIComponent(filepath)}` +
                `&t=${encodeURIComponent(timestamp)}`;
    if (this.iframe.src !== url) this.iframe.src = url;
  }
}

app.registerExtension({
  name: "Comfy3D.Visualization",
  async beforeRegisterNodeDef(nodeType, nodeData) {
    if (!PREVIEW_NODES.includes(nodeData.name)) return;

    const onCreated = nodeType.prototype.onNodeCreated;
    nodeType.prototype.onNodeCreated = function () {
      onCreated?.apply(this, arguments);
      const container = document.createElement("div");
      Object.assign(container.style, { width: "100%", height: "100%" });
      this.visualizer = new Visualizer(this, container);
      this.addDOMWidget("preview3d", "preview", container, {
        serialize: false,
      });
      this.setSize([480, 420]);
    };

    const onExecuted = nodeType.prototype.onExecuted;
    nodeType.prototype.onExecuted = function (message) {
      onExecuted?.apply(this, arguments);
      const previews = message?.previews;
      if (previews?.length && this.visualizer) {
        this.visualizer.update(previews[0].filepath, Date.now());
      }
    };
  },
});
